"""Deterministic sampling/mixing operators (operators/sampling.py)."""

import pytest

from anisearch_model_spark.operators.sampling import (
    stratified_sample,
    token_budget_mix,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_stratified_sample_exact_counts_and_determinism(spark, docs):
    got = stratified_sample(docs, "lang", 15, "doc_id", seed=42).toPandas()
    counts = got.groupby("lang").size()
    full = docs.toPandas().groupby("lang").size()
    for lang, n_avail in full.items():
        assert counts.get(lang, 0) == min(15, n_avail)
    # deterministic across runs AND across input partitioning
    again = stratified_sample(
        docs.repartition(13), "lang", 15, "doc_id", seed=42
    ).toPandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])
    # a different seed draws a different sample
    other = stratified_sample(docs, "lang", 15, "doc_id", seed=7).toPandas()
    assert sorted(got["doc_id"]) != sorted(other["doc_id"])


def test_stratified_partial_topn_equals_naive_window(spark, docs):
    """The map-side partial top-n phase must not change the selection —
    it only bounds what reaches the shuffle."""
    a = stratified_sample(docs, "lang", 10, "doc_id", seed=3, exact=True)
    b = stratified_sample(docs, "lang", 10, "doc_id", seed=3, exact=False)
    assert sorted(r["doc_id"] for r in a.collect()) == \
        sorted(r["doc_id"] for r in b.collect())


def test_stratified_sample_keeps_full_rows(docs):
    got = stratified_sample(docs, "lang", 5, "doc_id", seed=1)
    assert set(got.columns) == set(docs.columns)


def test_token_budget_mix_greedy_prefix(spark):
    rows = [
        # lang a, priority = score desc: 40 + 35 fills 80-budget; the 30
        # OVERFLOWS and cuts the group (prefix rule — the later 5 that
        # would fit is still dropped)
        ("a", 1, 40, 9.0), ("a", 2, 35, 8.0), ("a", 3, 30, 7.0), ("a", 4, 5, 6.0),
        # lang b fits entirely
        ("b", 5, 50, 9.0), ("b", 6, 20, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "lang string, doc_id long, toks long, score double"
    )
    got = token_budget_mix(df, "lang", "toks", 80, "score", "doc_id")
    picked = {r["doc_id"]: r["cum_weight"] for r in got.collect()}
    assert picked == {1: 40, 2: 75, 5: 50, 6: 70}


def test_token_budget_mix_tie_break_by_id(spark):
    rows = [("a", 2, 60, 5.0), ("a", 1, 60, 5.0)]
    df = spark.createDataFrame(
        rows, "lang string, doc_id long, toks long, score double"
    )
    got = token_budget_mix(df, "lang", "toks", 60, "score", "doc_id")
    assert [r["doc_id"] for r in got.collect()] == [1]
