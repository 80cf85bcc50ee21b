"""Index persistence + resumable build orchestration.

Layout of an index directory (Parquet fallback for Iceberg — no Iceberg
runtime jar is available offline in this sandbox; the write paths are
structured so ``writeTo(...).append()`` is a config-only swap):

    <index_dir>/doc_map/            doc_id, conv_id, turn_idx, role, text, tool, ts
    <index_dir>/postings/bucket=N/  posting blocks for doc-range bucket N
    <index_dir>/dictionary/         term, df, cf
    <index_dir>/stats.json          n_docs, avgdl, tokenizer_version, k1, b
    <index_dir>/checkpoints/        one row per completed bucket (parquet)

Resumability (north rule): each doc-range bucket is the unit of restart.
``build_index`` consults the checkpoint table, plans ONLY missing buckets,
appends their posting partitions, and records per-bucket lineage + metrics
(postings emitted, bytes compressed, skew ratio).  The reference has no
failure story at all — a crash in ``src/sbert.py:336-356`` loses the whole
column; its per-column ``.npy`` granularity maps to our per-bucket
checkpoint granularity (SURVEY.md §3.3).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anisearch_model_spark.config import BM25Params, TOKENIZER_VERSION
from anisearch_model_spark.index.build import (
    build_dictionary,
    build_postings,
    bucket_span,
    tokenize_docs,
)
from anisearch_model_spark.index.docmap import assign_doc_ids

CHECKPOINT_SCHEMA = (
    "bucket int, status string, postings_emitted long, bytes_compressed long, "
    "n_terms long, skew_ratio double, lineage string, updated_at double"
)


def _read_checkpoints(spark: SparkSession, index_dir: str) -> DataFrame:
    path = os.path.join(index_dir, "checkpoints")
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], CHECKPOINT_SCHEMA)


def completed_buckets(spark: SparkSession, index_dir: str) -> set[int]:
    cps = _read_checkpoints(spark, index_dir)
    return {
        r["bucket"]
        for r in cps.filter(F.col("status") == "done").select("bucket").collect()
    }


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    num_buckets: int = 32,
    params: BM25Params | None = None,
    fail_after_buckets: int | None = None,
) -> dict:
    """Full (or resumed) index build.  Returns build metrics dict.

    ``fail_after_buckets`` is a test hook: stop after writing that many
    buckets (simulates a mid-build crash for the resume test).
    """
    params = params or BM25Params()
    os.makedirs(index_dir, exist_ok=True)
    t0 = time.time()

    doc_map_path = os.path.join(index_dir, "doc_map")
    if not os.path.exists(os.path.join(doc_map_path, "_SUCCESS")):
        docs = assign_doc_ids(transcripts, num_partitions=num_buckets)
        docs.write.mode("overwrite").parquet(doc_map_path)
    docs = spark.read.parquet(doc_map_path)

    tf = tokenize_docs(docs)

    stats_path = os.path.join(index_dir, "stats.json")
    dict_path = os.path.join(index_dir, "dictionary")
    if not os.path.exists(stats_path):
        # doc lengths for ALL docs (zero-token docs count toward avgdl)
        from anisearch_model_spark.index.build import doc_lengths

        dl = doc_lengths(docs)
        row = dl.agg(F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")).collect()[0]
        stats = {
            "n_docs": int(row["n"]),
            "avgdl": float(row["avgdl"] or 0.0),
            "tokenizer_version": TOKENIZER_VERSION,
            "k1": params.k1,
            "b": params.b,
            "num_buckets": num_buckets,
        }
        with open(stats_path, "w", encoding="utf-8") as f:
            json.dump(stats, f, indent=2, sort_keys=True)
        build_dictionary(tf).write.mode("overwrite").parquet(dict_path)
    with open(stats_path, encoding="utf-8") as f:
        stats = json.load(f)

    n_docs = stats["n_docs"]
    span = bucket_span(n_docs, num_buckets)
    all_buckets = sorted({b for b in range((n_docs + span - 1) // span)})
    done = completed_buckets(spark, index_dir)
    todo = [b for b in all_buckets if b not in done]
    if fail_after_buckets is not None:
        todo = todo[:fail_after_buckets]

    postings_path = os.path.join(index_dir, "postings")
    cp_rows = []
    lineage = json.dumps(
        {
            "tokenizer_version": TOKENIZER_VERSION,
            "num_buckets": num_buckets,
            "span": span,
            "source": "transcripts",
        },
        sort_keys=True,
    )
    # Build one bucket-group at a time only in the resume path; the common
    # path builds all missing buckets in ONE distributed job.
    if todo:
        postings = build_postings(tf, n_docs, num_buckets, buckets=todo)
        (
            postings.write.mode("overwrite")
            .partitionBy("bucket")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(postings_path)
        )
        # per-bucket metrics from the freshly written store (cheap metadata agg)
        written = spark.read.parquet(postings_path).filter(
            F.col("bucket").isin(todo)
        )
        metrics = (
            written.groupBy("bucket")
            .agg(
                F.sum("n").alias("postings_emitted"),
                F.sum(
                    F.octet_length("doc_deltas")
                    + F.octet_length("tfs")
                    + F.octet_length("dls")
                ).alias("bytes_compressed"),
                F.countDistinct("term").alias("n_terms"),
                (F.max("n") / F.avg("n")).alias("skew_ratio"),
            )
            .collect()
        )
        now = time.time()
        for m in metrics:
            cp_rows.append(
                (
                    int(m["bucket"]),
                    "done",
                    int(m["postings_emitted"]),
                    int(m["bytes_compressed"]),
                    int(m["n_terms"]),
                    float(m["skew_ratio"]),
                    lineage,
                    now,
                )
            )
        if cp_rows:
            spark.createDataFrame(cp_rows, CHECKPOINT_SCHEMA).write.mode(
                "append"
            ).parquet(os.path.join(index_dir, "checkpoints"))

    elapsed = time.time() - t0
    return {
        "n_docs": n_docs,
        "avgdl": stats["avgdl"],
        "buckets_built": len(todo),
        "buckets_skipped": len(done),
        "elapsed_sec": elapsed,
        "turns_per_sec": n_docs / elapsed if elapsed > 0 else 0.0,
    }
