"""Connected components / dedup clustering."""

import pytest

from anisearch_model_spark.operators.graph import (
    connected_components,
    dedup_clusters,
    drop_near_duplicates,
)


def _labels(df):
    return {r["node"]: r["label"] for r in df.collect()}


def test_chain_collapses_to_min(spark):
    # path graph 1-2-3-...-12: diameter 11 exercises the pointer-doubling
    # shortcut (plain propagation would need 11 rounds; log2(11) ≈ 4)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "doc_a long, doc_b long"
    )
    got = _labels(connected_components(pairs))
    assert got == {i: 1 for i in range(1, 13)}


def test_multiple_components_and_direction(spark):
    # edges given in arbitrary direction; two components + a pair
    pairs = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21), (40, 30)], "doc_a long, doc_b long"
    )
    got = _labels(connected_components(pairs))
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 30: 30, 40: 30}


def test_empty_pairs(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0


def test_dedup_clusters_singletons_and_sizes(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert rows == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        4: (4, 1),
        5: (5, 2), 6: (5, 2),
        7: (7, 1),
    }


def test_drop_near_duplicates_keeps_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    kept = drop_near_duplicates(docs, pairs)
    assert kept.columns == ["doc_id", "text"]  # schema preserved
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 4, 5, 7]


def test_max_iter_guard(spark):
    # even with max_iter=1 the result is well-formed (possibly unconverged
    # labels are still ids of nodes in the same component)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "doc_a long, doc_b long"
    )
    got = _labels(connected_components(pairs, max_iter=1))
    assert set(got) == set(range(1, 7))
    assert all(lbl in got for lbl in got.values())


def test_cache_registries_are_session_scoped(spark):
    """Interleaved dedup/CC runs on DIFFERENT SparkSessions must not
    release each other's caches: the registry is keyed by session, so a
    run on session B leaves session A's resident cache intact, while a
    second run on A still releases A's own previous cache (≤1 resident
    per session)."""
    from pyspark.sql import functions as F

    from anisearch_model_spark.operators import dedup, graph

    spark_b = spark.newSession()

    def docs(s):
        return s.createDataFrame(
            [(i, f"alpha beta gamma{i}") for i in range(1, 6)],
            "doc_id long, text string",
        )

    t_a = dedup._fresh_token_cache(docs(spark), "doc_id", "text")
    t_b = dedup._fresh_token_cache(docs(spark_b), "doc_id", "text")
    assert t_a.storageLevel.useMemory, "session-B run released session-A cache"
    assert t_b.storageLevel.useMemory
    t_a2 = dedup._fresh_token_cache(docs(spark), "doc_id", "text")
    assert not t_a.storageLevel.useMemory, "same-session rerun must release"
    assert t_b.storageLevel.useMemory
    assert t_a2.storageLevel.useMemory

    # graph label registry: a CC run on B keeps A's final labels readable
    pairs_a = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    pairs_b = spark_b.createDataFrame([(7, 8)], "doc_a long, doc_b long")
    lab_a = connected_components(pairs_a)
    lab_b = connected_components(pairs_b)
    assert {r["node"]: r["label"] for r in lab_a.collect()} == {1: 1, 2: 1, 3: 1}
    assert {r["node"]: r["label"] for r in lab_b.collect()} == {7: 7, 8: 7}
    assert id(lab_a.sparkSession) in graph._label_caches
    assert id(lab_b.sparkSession) in graph._label_caches
