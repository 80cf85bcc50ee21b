"""Stable docID assignment + the north-rule per-turn invariant.

doc_id must be a pure function of (conv_id, turn_idx) ordering —
independent of input partitioning / parallelism (replaces the reference's
fragile positional identity, src/api.py:430-431)."""

import pandas as pd
from pyspark.sql import functions as F

from anisearch_model_spark.datagen import gen_transcripts
from anisearch_model_spark.index.docmap import assign_doc_ids


def _collect_ids(spark, tr, num_partitions):
    out = (
        assign_doc_ids(tr, num_partitions=num_partitions)
        .select("doc_id", "conv_id", "turn_idx")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out


def test_docids_dense_and_ordered(spark):
    tr = gen_transcripts(spark, 2000, seed=7)
    out = _collect_ids(spark, tr, 5)
    assert out["doc_id"].tolist() == list(range(len(out)))
    keys = list(zip(out["conv_id"], out["turn_idx"]))
    assert keys == sorted(keys)


def test_docids_independent_of_partitioning(spark):
    tr = gen_transcripts(spark, 2000, seed=7)
    a = _collect_ids(spark, tr, 3)
    b = _collect_ids(spark, tr.repartition(13), 11)
    pd.testing.assert_frame_equal(a, b)


def test_per_turn_text_equality_invariant(spark):
    """North-rule invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering between source and doc_map corpus."""
    tr = gen_transcripts(spark, 2000, seed=42)
    docs = assign_doc_ids(tr, num_partitions=6)
    src = tr.select("conv_id", "turn_idx", "text").toPandas()
    src = src.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got = (
        docs.select("doc_id", "conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["text"].tolist() == src["text"].tolist()
    assert got["conv_id"].tolist() == src["conv_id"].tolist()
    assert got["turn_idx"].tolist() == src["turn_idx"].tolist()


def test_no_duplicate_keys(spark):
    tr = gen_transcripts(spark, 1500, seed=3)
    dups = (
        assign_doc_ids(tr, 4)
        .groupBy("conv_id", "turn_idx")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .count()
    )
    assert dups == 0


def test_bucket_of_matches_bisect_under_heavy_boundary_ties():
    """The vectorized turn tie-break must equal pure-python
    bisect_right(bounds, (conv, turn)) even when many rows collide with
    boundary convs (boundary convs are popular keys by construction)."""
    from bisect import bisect_right

    import numpy as np

    from anisearch_model_spark.index.docmap import _bucket_of

    rng = np.random.default_rng(11)
    convs = [f"c{i:03d}" for i in range(12)]
    # boundaries including repeated convs with different turn splits
    bounds = [("c002", 3), ("c002", 7), ("c005", 0), ("c009", 4), ("c009", 4)]
    conv = np.array([convs[i] for i in rng.integers(0, 12, 5000)], dtype=object)
    turn = rng.integers(0, 10, 5000)
    got = _bucket_of(conv, turn, bounds)
    expect = np.array(
        [bisect_right(bounds, (c, int(t))) for c, t in zip(conv, turn)],
        dtype="int32",
    )
    np.testing.assert_array_equal(got, expect)
