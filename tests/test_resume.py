"""Resumable-build test (north rule: resumable from per-partition
checkpoints with lineage + metrics; SURVEY.md §5 e2e resume).

Simulate a crash after half the buckets, re-run, assert (a) completed
buckets are skipped, (b) the final index equals a fresh one-shot build."""

import shutil

import pandas as pd
from pyspark.sql import functions as F

from anisearch_model_spark.datagen import gen_transcripts
from anisearch_model_spark.index.store import build_index, completed_buckets


def _postings_pdf(spark, d):
    pdf = (
        spark.read.parquet(f"{d}/postings")
        .withColumn("bucket", F.col("bucket").cast("int"))
        .toPandas()
        .sort_values(["bucket", "term", "block_id"])
        .reset_index(drop=True)
    )
    return pdf


def test_resume_skips_and_is_identical(spark, tmp_path):
    d_full = str(tmp_path / "full")
    d_resume = str(tmp_path / "resume")
    for d in (d_full, d_resume):
        shutil.rmtree(d, ignore_errors=True)
    tr = gen_transcripts(spark, 2500, seed=11)

    m_full = build_index(spark, tr, d_full, num_buckets=6)
    assert m_full["buckets_built"] == 6

    # crash after 3 buckets
    m_part = build_index(spark, tr, d_resume, num_buckets=6, fail_after_buckets=3)
    assert m_part["buckets_built"] == 3
    assert completed_buckets(spark, d_resume) == set(range(3)) or len(
        completed_buckets(spark, d_resume)
    ) == 3

    # resume
    m_res = build_index(spark, tr, d_resume, num_buckets=6)
    assert m_res["buckets_skipped"] == 3
    assert m_res["buckets_built"] == 3
    assert completed_buckets(spark, d_resume) == set(range(6))

    a = _postings_pdf(spark, d_full)
    b = _postings_pdf(spark, d_resume)
    pd.testing.assert_frame_equal(a, b)

    # third run: everything checkpointed → no-op
    m_noop = build_index(spark, tr, d_resume, num_buckets=6)
    assert m_noop["buckets_built"] == 0 and m_noop["buckets_skipped"] == 6


def test_checkpoint_metrics_recorded(spark, tmp_path):
    d = str(tmp_path / "metrics")
    tr = gen_transcripts(spark, 1200, seed=5)
    build_index(spark, tr, d, num_buckets=4)
    cp = spark.read.parquet(f"{d}/checkpoints").toPandas()
    assert set(cp["status"]) == {"done"}
    assert (cp["postings_emitted"] > 0).all()
    assert (cp["bytes_compressed"] > 0).all()
    assert (cp["skew_ratio"] >= 1.0).all()
    assert cp["lineage"].str.contains("tokenizer_version").all()


def test_empty_corpus_builds_and_queries(spark, tmp_path):
    """A 0-doc corpus must build a valid (empty) index and answer queries
    with 0 rows — empty partition dirs have no data files, so every index
    reader pins its schema instead of relying on inference."""
    from anisearch_model_spark.datagen import TRANSCRIPT_SCHEMA
    from anisearch_model_spark.index.store import build_index
    from anisearch_model_spark.query.engine import IndexStore, search, topk_bmw

    d = str(tmp_path / "empty_idx")
    empty = spark.createDataFrame([], TRANSCRIPT_SCHEMA)
    m = build_index(spark, empty, d, num_buckets=4)
    assert m["n_docs"] == 0
    idx = IndexStore(spark, d)
    assert search(idx, "hero", k=5).count() == 0
    assert topk_bmw(idx, "hero", 5).count() == 0
    assert idx.term_dfs(["hero"]) == {}
