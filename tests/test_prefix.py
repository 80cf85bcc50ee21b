"""Prefix (``term*``) queries: dictionary expansion + BM25 disjunction.

Contract (query/engine.py::parse_query_terms / expand_prefixes /
resolve_query_idf): a trailing-``*`` token expands against the dictionary
to the highest-df terms (capped at ``max_expansions``, (df DESC, term
ASC) order), and the expanded set scores as an ordinary multi-term BM25
disjunction — so a prefix query must be bit-identical to the literal
query spelling out its expansion.  The reference engine has no lexical
matching at all (dense cosine, ``src/api.py:270-313``); prefix matching
is table stakes for the fulltext engine replacing it."""

import pytest
from pyspark.sql import functions as F

from anisearch_model_spark.query.engine import (
    IndexStore,
    expand_prefixes,
    parse_query,
    parse_query_terms,
    resolve_query_idf,
    search,
    topk_bmw,
    topk_exhaustive,
)


@pytest.fixture(scope="module")
def idx(spark, index_dir):
    return IndexStore(spark, index_dir)


def test_parse_query_terms_no_wildcard_is_parse_query(idx):
    q = "the hero battles a dragon"
    assert parse_query_terms(q) == (parse_query(q), [], [])


def test_parse_query_terms_extracts_prefixes():
    lits, prefixes, fuzzy = parse_query_terms("hero drag* bat*")
    assert prefixes == ["bat", "drag"]
    assert lits == ["hero"] and fuzzy == []


def test_parse_query_terms_stem_is_normalized_not_stopworded():
    # stems normalize (lowercase) but are NOT stopword-filtered:
    # "The*" must survive as prefix "the" (it may match "theory")
    lits, prefixes, _ = parse_query_terms("The* hero")
    assert prefixes == ["the"]
    assert lits == ["hero"]


def test_parse_query_terms_multi_token_stem():
    # "data-pro*" normalizes to two tokens: leading ones are literals,
    # the last is the prefix
    lits, prefixes, _ = parse_query_terms("data-pro*")
    assert prefixes == ["pro"]
    assert lits == ["data"]


def test_parse_query_terms_bare_star_dropped():
    assert parse_query_terms("* hero") == (["hero"], [], [])


def test_expand_prefixes_matches_dictionary(spark, idx):
    rows = (
        idx.dictionary.groupBy("term").agg(F.sum("df").alias("df"))
        .filter(F.col("term").startswith("he"))
        .orderBy(F.desc("df"), F.asc("term"))
        .collect()
    )
    want = {r["term"]: int(r["df"]) for r in rows}
    assert want, "corpus should contain he* terms"
    got = expand_prefixes(idx, ["he"])
    assert got == want


def test_expand_prefixes_cap_keeps_highest_df(spark, idx):
    full = (
        idx.dictionary.groupBy("term").agg(F.sum("df").alias("df"))
        .filter(F.col("term").startswith("s"))
        .orderBy(F.desc("df"), F.asc("term"))
        .collect()
    )
    assert len(full) > 3, "need a wide prefix for the cap test"
    got = expand_prefixes(idx, ["s"], max_expansions=3)
    assert len(got) == 3
    assert got == {r["term"]: int(r["df"]) for r in full[:3]}


def test_prefix_query_identical_to_spelled_out_disjunction(spark, idx):
    expanded = sorted(expand_prefixes(idx, ["he"]))
    lit_q = " ".join(expanded + ["dragon"])
    a = topk_exhaustive(idx, "he* dragon", 10).collect()
    b = topk_exhaustive(idx, lit_q, 10).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in a] == \
        [(r["rank"], r["doc_id"], r["score"]) for r in b]
    assert a, "prefix query should match docs"


def test_prefix_bmw_matches_exhaustive(spark, idx):
    a = topk_bmw(idx, "he* dragon", 10).collect()
    b = topk_exhaustive(idx, "he* dragon", 10).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in a] == \
        [(r["rank"], r["doc_id"], r["score"]) for r in b]


def test_prefix_search_end_to_end_metadata(spark, idx):
    rows = search(idx, "he* dragon", 5).collect()
    assert rows and all(r["conv_id"] for r in rows)


def test_prefix_overlapping_literal_dedupes(spark, idx):
    # a literal term also matched by the prefix must score ONCE
    expanded = sorted(expand_prefixes(idx, ["he"]))
    some = expanded[0]
    a = topk_exhaustive(idx, f"he* {some}", 10).collect()
    b = topk_exhaustive(idx, "he*", 10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
        [(r["doc_id"], r["score"]) for r in b]


def test_prefix_no_match_returns_empty(spark, idx):
    assert topk_bmw(idx, "zzzzqqq*", 10).count() == 0


def test_prefix_field_scoped_expansion(spark, tmp_path):
    """On a field-qualified index a field-scoped prefix expands only over
    that field's dictionary entries and scores vs the field sub-corpus."""
    from anisearch_model_spark.datagen import TRANSCRIPT_SCHEMA
    from anisearch_model_spark.index.store import build_index

    rows = [
        ("c0", 0, "user", "alpha alarm", None, None),
        ("c0", 1, "assistant", "alpha beacon", None, None),
        ("c1", 0, "user", "alert beta", None, None),
        ("c1", 1, "assistant", "alpha gamma", None, None),
    ]
    tr = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    d = str(tmp_path / "fidx")
    build_index(spark, tr, d, num_buckets=1, field_col="role")
    fidx = IndexStore(spark, d)
    # user field has {alpha, alarm, alert}; assistant has only {alpha}
    assert set(expand_prefixes(fidx, ["al"], field="user")) == \
        {"alpha", "alarm", "alert"}
    assert set(expand_prefixes(fidx, ["al"], field="assistant")) == {"alpha"}
    got = topk_bmw(fidx, "al*", 10, field="assistant")
    assert got.count() == 2  # both assistant turns contain alpha


def test_resolve_query_idf_merges_literals_and_expansions(idx):
    lit = resolve_query_idf(idx, "dragon")
    pre = resolve_query_idf(idx, "he*")
    both = resolve_query_idf(idx, "he* dragon")
    assert set(both) == set(lit) | set(pre)
    for t, v in lit.items():
        assert both[t] == v
    for t, v in pre.items():
        assert both[t] == v


def test_parse_query_terms_fuzzy_markers():
    lits, prefixes, fuzzy = parse_query_terms("hero~ drag~1 exact~0 plain")
    assert fuzzy == [("drag", 1), ("hero", 2)]
    assert prefixes == []
    assert sorted(lits) == ["exact", "plain"]


def test_parse_query_terms_fuzzy_widest_distance_wins():
    _, _, fuzzy = parse_query_terms("hero~1 hero~2")
    assert fuzzy == [("hero", 2)]


def test_expand_fuzzy_matches_dictionary(spark, idx):
    from anisearch_model_spark.query.engine import expand_fuzzy

    rows = (
        idx.dictionary.groupBy("term").agg(F.sum("df").alias("df"))
        .collect()
    )
    import numpy as np

    def lev(a, b):
        m, n = len(a), len(b)
        d = np.arange(n + 1)
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return int(d[n])

    want = {r["term"]: int(r["df"]) for r in rows if lev(r["term"], "hero") <= 2}
    got = expand_fuzzy(idx, [("hero", 2)])
    assert got == want
    assert "hero" in got  # distance 0: the exact term is always included


def test_fuzzy_query_identical_to_spelled_out_disjunction(spark, idx):
    from anisearch_model_spark.query.engine import expand_fuzzy

    expanded = sorted(expand_fuzzy(idx, [("hero", 2)]))
    a = topk_exhaustive(idx, "hero~ dragon", 10).collect()
    b = topk_exhaustive(idx, " ".join(expanded + ["dragon"]), 10).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in a] == \
        [(r["rank"], r["doc_id"], r["score"]) for r in b]
    assert a


def test_fuzzy_typo_recovers_term(spark, tmp_path):
    """A misspelled query term ('tabel~') still finds 'table' docs."""
    from anisearch_model_spark.datagen import TRANSCRIPT_SCHEMA
    from anisearch_model_spark.index.store import build_index

    rows = [
        ("c0", 0, "user", "table scan speed", None, None),
        ("c1", 0, "user", "nothing relevant", None, None),
    ]
    tr = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    d = str(tmp_path / "idx")
    build_index(spark, tr, d, num_buckets=1)
    i = IndexStore(spark, d)
    got = search(i, "tabel~", 10).collect()
    assert [r["conv_id"] for r in got] == ["c0"]
    assert search(i, "tabel~1", 10).count() == 0  # distance is 2
