"""Boolean (+required -prohibited optional) query semantics
(query/boolean.py): Lucene-classic clause behavior over the BM25 index."""

import pytest
from pyspark.sql import functions as F

from anisearch_model_spark.datagen import TRANSCRIPT_SCHEMA
from anisearch_model_spark.index.store import build_index
from anisearch_model_spark.query.boolean import (
    boolean_search,
    boolean_topk,
    parse_boolean,
)
from anisearch_model_spark.query.engine import IndexStore, topk_exhaustive


@pytest.fixture(scope="module")
def idx(spark, index_dir):
    return IndexStore(spark, index_dir)


@pytest.fixture(scope="module")
def mini(spark, tmp_path_factory):
    rows = [
        ("c0", 0, "user", "alpha beta gamma", None, None),
        ("c1", 0, "user", "alpha beta", None, None),
        ("c2", 0, "user", "alpha gamma", None, None),
        ("c3", 0, "user", "beta gamma", None, None),
        ("c4", 0, "user", "alpha", None, None),
    ]
    d = str(tmp_path_factory.mktemp("bool") / "idx")
    spark_df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    build_index(spark, spark_df, d, num_buckets=1)
    i = IndexStore(spark, d)
    convs = i.doc_map.toPandas().set_index("doc_id")["conv_id"]
    return i, convs


def _convs(mini, q, **kw):
    i, convs = mini
    got = boolean_topk(i, q, k=10, **kw).toPandas()
    return {convs[d] for d in got["doc_id"]}


def test_parse_boolean_clauses():
    assert parse_boolean("+alpha beta -gamma") == (
        ["alpha"], ["beta"], ["gamma"]
    )


def test_parse_boolean_precedence():
    # required beats prohibited beats optional for a repeated term
    assert parse_boolean("+x -x x") == (["x"], [], [])
    assert parse_boolean("-y y") == ([], [], ["y"])


def test_parse_boolean_returns_raw_stems():
    req, opt, pro = parse_boolean("-state-of-the-art alpha +bat*")
    assert pro == ["state-of-the-art"]  # stems stay raw until expansion
    assert req == ["bat*"] and opt == ["alpha"]


def test_no_markers_identical_to_exhaustive(spark, idx):
    q = "hero battle dragon"
    a = boolean_topk(idx, q, 10).collect()
    b = topk_exhaustive(idx, q, 10).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in a] == \
        [(r["rank"], r["doc_id"], r["score"]) for r in b]
    assert a


def test_required_filters(mini):
    assert _convs(mini, "+beta alpha") == {"c0", "c1", "c3"}


def test_required_scores_too(mini):
    """A required-only query ranks by the required term's BM25 (c4's
    'alpha'-only doc is shortest, so it scores highest)."""
    i, convs = mini
    got = boolean_topk(i, "+alpha", k=10).toPandas()
    assert {convs[d] for d in got["doc_id"]} == {"c0", "c1", "c2", "c4"}
    assert convs[got["doc_id"].iloc[0]] == "c4"


def test_prohibited_excludes(mini):
    assert _convs(mini, "alpha -gamma") == {"c1", "c4"}


def test_combined_clauses(mini):
    assert _convs(mini, "+alpha +beta -gamma") == {"c1"}


def test_pure_negative_matches_nothing(mini):
    assert _convs(mini, "-alpha") == set()


def test_required_absent_term_empty(mini):
    assert _convs(mini, "+zzzunseen alpha") == set()


def test_prohibited_absent_term_noop(mini):
    assert _convs(mini, "alpha -zzzunseen") == \
        {"c0", "c1", "c2", "c4"}


def test_boolean_search_metadata(spark, idx):
    rows = boolean_search(idx, "+hero battle -dragon", 5).collect()
    assert all(r["conv_id"] for r in rows)
    # no returned doc may contain the prohibited term
    from anisearch_model_spark.query.boolean import _doc_ids_for_terms

    bad = {r["doc_id"] for r in _doc_ids_for_terms(idx, ["dragon"]).collect()}
    assert all(r["doc_id"] not in bad for r in rows)
    # and every returned doc contains the required term
    need = {r["doc_id"] for r in _doc_ids_for_terms(idx, ["hero"]).collect()}
    assert all(r["doc_id"] in need for r in rows)


def test_boolean_field_scoped(spark, tmp_path):
    rows = [
        ("c0", 0, "user", "alpha beta", None, None),
        ("c0", 1, "assistant", "alpha beta", None, None),
        ("c1", 0, "assistant", "alpha gamma", None, None),
    ]
    tr = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    d = str(tmp_path / "idx")
    build_index(spark, tr, d, num_buckets=1, field_col="role")
    i = IndexStore(spark, d)
    roles = i.doc_map.toPandas().set_index("doc_id")["role"]
    got = boolean_topk(i, "+alpha -beta", k=10, field="assistant").toPandas()
    assert len(got) == 1
    assert all(roles[d] == "assistant" for d in got["doc_id"])


def test_boolean_respects_tombstones(spark, tmp_path):
    from anisearch_model_spark.index.tombstones import delete_docs

    rows = [
        ("c0", 0, "user", "alpha beta", None, None),
        ("c1", 0, "user", "alpha beta beta", None, None),
    ]
    tr = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    d = str(tmp_path / "idx")
    build_index(spark, tr, d, num_buckets=1)
    i = IndexStore(spark, d)
    pre = boolean_topk(i, "+alpha beta", k=10).toPandas()
    assert len(pre) == 2
    dead = int(pre["doc_id"].iloc[0])
    delete_docs(spark, d, [dead])
    post = boolean_topk(i, "+alpha beta", k=10).toPandas()
    assert post["doc_id"].tolist() == [x for x in pre["doc_id"] if x != dead]


def test_cli_info_and_recover(spark, tmp_path, capsys):
    """`info` and `recover` are sparkless metadata commands."""
    import json

    from anisearch_model_spark.cli import main
    from anisearch_model_spark.datagen import TRANSCRIPT_SCHEMA

    rows = [("c0", 0, "user", "alpha beta", None, None)]
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(rows, TRANSCRIPT_SCHEMA), d,
                num_buckets=1)
    assert main(["info", "--index", d]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] == 1 and out["n_buckets"] == 1
    # r6 fused build: positions are built and stamped by build_index
    assert out["tombstones"] == 0 and out["positions"]["ready"] is True
    assert main(["recover", "--index", d]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["recovered"] is None


@pytest.fixture(scope="module")
def pat(spark, tmp_path_factory):
    rows = [
        ("c0", 0, "user", "bat cave alpha", None, None),
        ("c1", 0, "user", "batch job alpha", None, None),
        ("c2", 0, "user", "battle cry alpha", None, None),
        ("c3", 0, "user", "alpha only", None, None),
        ("c4", 0, "user", "bat batch", None, None),
    ]
    d = str(tmp_path_factory.mktemp("boolpat") / "idx")
    build_index(spark, spark.createDataFrame(rows, TRANSCRIPT_SCHEMA), d,
                num_buckets=1)
    i = IndexStore(spark, d)
    convs = i.doc_map.toPandas().set_index("doc_id")["conv_id"]
    return i, convs


def test_required_prefix_clause_is_or_within(pat):
    # +bat* = "must contain SOME bat-prefixed term"
    assert _convs(pat, "+bat* alpha") == {"c0", "c1", "c2", "c4"}


def test_two_required_prefix_clauses_and_between(pat):
    # +bat* +c* = some bat-term AND some c-term (cave / cry)
    assert _convs(pat, "+bat* +c*") == {"c0", "c2"}


def test_prohibited_prefix_excludes_any_expansion(pat):
    assert _convs(pat, "alpha -bat*") == {"c3"}


def test_required_multi_token_stem_still_all_required(pat):
    # "+bat-cave": each literal token its own AND clause
    assert _convs(pat, "+bat-cave alpha") == {"c0"}


def test_required_unmatchable_pattern_empty(pat):
    assert _convs(pat, "+zzz* alpha") == set()


def test_required_fuzzy_clause(pat):
    # batl~1 -> battle? lev(batl,battle)=2; batl~2 covers bat(1)/batch(2)/battle(2)
    assert _convs(pat, "+batl~2") == {"c0", "c1", "c2", "c4"}
    assert _convs(pat, "+batl~1") == {"c0", "c4"}  # only bat (distance 1)


def test_optional_pattern_scores_like_plain_prefix(pat):
    i, _ = pat
    a = boolean_topk(i, "bat*", k=10).collect()
    from anisearch_model_spark.query.engine import topk_exhaustive as tke
    b = tke(i, "bat*", 10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
        [(r["doc_id"], r["score"]) for r in b]
