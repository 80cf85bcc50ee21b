"""Snippet/highlight generation (query/highlight.py)."""

import pytest

from anisearch_model_spark.query.highlight import (
    attach_snippets,
    make_snippet,
    search_snippets,
)


def test_make_snippet_wraps_matches():
    s = make_snippet("the hero fought a dragon", {"hero", "dragon"})
    assert s == "the **hero** fought a **dragon**"


def test_make_snippet_case_insensitive_raw_offsets():
    s = make_snippet("The HERO Fought", {"hero"})
    assert s == "The **HERO** Fought"


def test_make_snippet_accent_fold_matches_normalized_term():
    # 'Café' normalizes to 'cafe' — the raw spelling is what gets wrapped
    s = make_snippet("visit the Café tomorrow", {"cafe"})
    assert "**Café**" in s


def test_make_snippet_densest_window_and_ellipses():
    text = "alpha " + "filler " * 60 + "beta gamma beta end"
    s = make_snippet(text, {"alpha", "beta", "gamma"}, window=40)
    # the 3-match cluster at the tail beats the lone leading alpha
    assert "**beta** **gamma** **beta**" in s
    assert s.startswith("...")
    assert "**alpha**" not in s


def test_make_snippet_no_match_head_window():
    s = make_snippet("just some plain text here", set(), window=14)
    assert s == "just some plai..."


def test_make_snippet_custom_tags():
    s = make_snippet("hero time", {"hero"}, pre="<em>", post="</em>")
    assert s == "<em>hero</em> time"


def test_attach_snippets_schema_not_mutated(spark):
    df = spark.createDataFrame(
        [(1, "hero battles"), (2, "no match here")], "doc_id long, text string"
    )
    n_before = len(df.schema.fields)
    out = attach_snippets(df, {"hero"})
    assert len(df.schema.fields) == n_before  # StructType.add mutation guard
    rows = {r["doc_id"]: r["snippet"] for r in out.collect()}
    assert rows[1] == "**hero** battles"
    assert rows[2] == "no match here"


def test_search_snippets_end_to_end(spark, index_dir):
    from anisearch_model_spark.query.engine import IndexStore

    idx = IndexStore(spark, index_dir)
    rows = search_snippets(idx, "hero dragon", k=5).collect()
    assert rows
    for r in rows:
        assert r["snippet"]
        assert "**" in r["snippet"]  # a hit always contains a query term


def test_search_snippets_highlights_prefix_expansions(spark, index_dir):
    from anisearch_model_spark.query.engine import IndexStore, expand_prefixes

    idx = IndexStore(spark, index_dir)
    expanded = set(expand_prefixes(idx, ["he"]))
    rows = search_snippets(idx, "he*", k=5).collect()
    assert rows
    marked = " ".join(r["snippet"] for r in rows)
    assert any(f"**{t}**" in marked for t in expanded)
