"""Hand-computed cases for operators/evaluation.py::relevance_metrics.

Replaces the reference's driver-side per-query eval loop
(/root/reference/src/test.py:221-274) with a distributed program; these
cases pin the metric arithmetic against values worked out by hand.
"""

import math

import pytest

from anisearch_model_spark.operators.evaluation import relevance_metrics


def _rows(spark, results, qrels, k=10):
    r = spark.createDataFrame(results, "query_id long, doc_id long, rank long")
    q = spark.createDataFrame(qrels, "query_id long, doc_id long, grade long")
    out = relevance_metrics(r, q, k=k).collect()
    return {row["query_id"]: row for row in out}


def test_perfect_ranking_is_all_ones(spark):
    # two relevant docs, returned in ideal order, nothing else relevant
    m = _rows(
        spark,
        results=[(1, 10, 1), (1, 11, 2)],
        qrels=[(1, 10, 2), (1, 11, 1)],
    )[1]
    assert m["ndcg"] == 1.0
    assert m["mrr"] == 1.0
    assert m["precision_k"] == 0.2  # 2 hits / k=10
    assert m["recall_k"] == 1.0


def test_binary_relevance_hand_computed(spark):
    # relevant doc at rank 3 of 3; one other relevant doc never returned
    m = _rows(
        spark,
        results=[(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        qrels=[(1, 12, 1), (1, 99, 1)],
        k=3,
    )[1]
    dcg = 1.0 / math.log2(4)  # (2^1 - 1) / log2(3 + 1)
    idcg = 1.0 + 1.0 / math.log2(3)  # ideal: both rels at ranks 1, 2
    assert m["ndcg"] == pytest.approx(round(dcg / idcg, 4), abs=1e-9)
    assert m["mrr"] == pytest.approx(round(1.0 / 3.0, 4), abs=1e-9)
    assert m["precision_k"] == pytest.approx(round(1.0 / 3.0, 4), abs=1e-9)
    assert m["recall_k"] == 0.5


def test_no_relevant_docs_zeroes_not_nulls(spark):
    m = _rows(spark, results=[(1, 10, 1)], qrels=[(2, 10, 1)])[1]
    assert (m["ndcg"], m["mrr"], m["precision_k"], m["recall_k"]) == (
        0.0,
        0.0,
        0.0,
        0.0,
    )


def test_graded_gain_prefers_high_grade_first(spark):
    # swapped order of a grade-3 and grade-1 doc: ndcg < 1 but > 0
    m = _rows(
        spark,
        results=[(1, 10, 1), (1, 11, 2)],
        qrels=[(1, 10, 1), (1, 11, 3)],
    )[1]
    dcg = 1.0 + 7.0 / math.log2(3)
    idcg = 7.0 + 1.0 / math.log2(3)
    assert m["ndcg"] == pytest.approx(round(dcg / idcg, 4), abs=1e-9)
    assert m["mrr"] == 1.0  # rank-1 doc is relevant (grade 1)


def test_rank_beyond_k_ignored(spark):
    # rank-11 hit must not count at k=10
    m = _rows(
        spark,
        results=[(1, 10 + i, i) for i in range(1, 12)],
        qrels=[(1, 21, 1)],  # only the rank-11 doc is relevant
    )[1]
    assert m["ndcg"] == 0.0
    assert m["mrr"] == 0.0
    assert m["precision_k"] == 0.0
    assert m["recall_k"] == 0.0


def test_multiple_queries_one_pass(spark):
    m = _rows(
        spark,
        results=[(1, 10, 1), (2, 20, 1), (2, 21, 2)],
        qrels=[(1, 10, 1), (2, 21, 1)],
    )
    assert set(m) == {1, 2}
    assert m[1]["ndcg"] == 1.0
    assert m[2]["mrr"] == 0.5


def test_k_must_be_positive(spark):
    r = spark.createDataFrame([(1, 10, 1)], "query_id long, doc_id long, rank long")
    with pytest.raises(ValueError):
        relevance_metrics(r, r.selectExpr("query_id", "doc_id", "rank as grade"), k=0)
