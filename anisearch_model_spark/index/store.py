"""Index persistence + resumable build orchestration.

Layout of an index directory (Parquet fallback for Iceberg — no Iceberg
runtime jar is available offline in this sandbox; the write paths are
structured so ``writeTo(...).append()`` is a config-only swap):

    <index_dir>/doc_map/            doc_id, conv_id, turn_idx, role, text, tool, ts
    <index_dir>/postings/bucket=N/field=F/  posting blocks for doc-range
                                    bucket N, field F ('*' when unqualified)
    <index_dir>/dictionary/         term, field, df, cf  (from block metadata)
    <index_dir>/stats.json          n_docs, avgdl, tokenizer_version, k1, b,
                                    field_col + per-field {n_docs, avgdl}
    <index_dir>/manifest.json       bucket → [first_doc_id, count) ranges
    <index_dir>/checkpoints/        one row per completed bucket (parquet)

Build shape (the scale story):
    1. deterministic range-bucketing by (conv_id, turn_idx) into
       num_buckets doc-range buckets, doc_ids by bucket offsets
       (zipWithIndex semantics — no global sort; deterministic across
       cluster sizes AND runs, see docmap.py);
    2. ONE fused mapInPandas pass per partition: tokenize + encode posting
       blocks; bucket ≡ partition; ZERO shuffle of posting data, only
       compressed blocks cross the Python/JVM boundary;
    3. dictionary + corpus stats derived from block metadata (df = Σ n,
       cf = Σ tf per term; avgdl = Σ cf / N) — the corpus is tokenized
       exactly once per build.

Resumability (north rule): each doc-range bucket is the unit of restart.
``build_index`` consults the checkpoint table, plans ONLY missing buckets
(a ``bucket IN missing`` filter over the cached bucketed corpus), appends
their posting partitions, and records per-bucket lineage + metrics
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
    DICTIONARY_SCHEMA,
    POSTINGS_SCHEMA,
    dictionary_from_postings,
    fused_tokenize_encode,
)
from anisearch_model_spark.index.docmap import BUCKETED_SCHEMA, bucketed_corpus

# bump when the on-disk posting-buffer layout changes incompatibly
INDEX_FORMAT_VERSION = 2

CHECKPOINT_SCHEMA = (
    "bucket int, status string, postings_emitted long, bytes_compressed long, "
    "n_terms long, skew_ratio double, lineage string, updated_at double"
)


def _read_checkpoints(spark: SparkSession, index_dir: str) -> DataFrame:
    path = os.path.join(index_dir, "checkpoints")
    if not os.path.isdir(path):
        return spark.createDataFrame([], CHECKPOINT_SCHEMA)
    return spark.read.parquet(path)


def completed_buckets(spark: SparkSession, index_dir: str) -> set[int]:
    cps = _read_checkpoints(spark, index_dir)
    return {
        r["bucket"]
        for r in cps.filter(F.col("status") == "done").select("bucket").collect()
    }


def _write_checkpoints(spark: SparkSession, index_dir: str, buckets: list[int],
                       lineage: str) -> None:
    """Record per-bucket metrics from the freshly written postings."""
    if not buckets:
        return
    written = spark.read.schema(POSTINGS_SCHEMA).parquet(
        os.path.join(index_dir, "postings")
    ).filter(F.col("bucket").isin(buckets))
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
    rows = [
        (
            int(m["bucket"]), "done", int(m["postings_emitted"]),
            int(m["bytes_compressed"]), int(m["n_terms"]),
            float(m["skew_ratio"]), lineage, now,
        )
        for m in metrics
    ]
    # buckets with zero postings (all-empty docs) still checkpoint as done
    seen = {r[0] for r in rows}
    rows += [
        (int(b), "done", 0, 0, 0, 1.0, lineage, now)
        for b in buckets if b not in seen
    ]
    spark.createDataFrame(rows, CHECKPOINT_SCHEMA).write.mode("append").parquet(
        os.path.join(index_dir, "checkpoints")
    )


def finalize_metadata(spark: SparkSession, index_dir: str, n_docs: int,
                      params: BM25Params, num_buckets: int,
                      field_col: str | None = None,
                      codec: str = "varint",
                      rewrite_dictionary: bool = True) -> dict:
    """(Re)derive dictionary + stats from the postings store.

    With ``field_col``, stats.json additionally records per-field
    {n_docs, avgdl} so field-scoped queries score against the field's own
    sub-corpus (the reference scores each text column independently,
    src/api.py:316-349).

    ``rewrite_dictionary=False`` skips the dictionary re-derive and reads
    the existing one for the stats aggregates — for COMPACTION, which
    merges buckets by pure concatenation and provably cannot change any
    term's df/cf: skipping saves a full postings pass AND keeps the
    dictionary directory untouched while concurrent readers query it
    (the in-place overwrite is the one non-atomic step left)."""
    dict_path = os.path.join(index_dir, "dictionary")
    if rewrite_dictionary:
        postings = spark.read.schema(POSTINGS_SCHEMA).parquet(
            os.path.join(index_dir, "postings")
        )
        # GLOBALLY term-range-partitioned + term-sorted within files: a
        # per-query `term IN (...)` lookup prunes to the 1-2 files whose
        # range covers the terms (file-level min/max skip) and then to
        # row groups inside them — the hash-partitioned layout (pre-r6)
        # forced every lookup to OPEN all partitions because each file
        # spanned the whole alphabet.  Lucene's sorted term dictionary,
        # expressed as parquet layout.
        dictionary_from_postings(postings).repartitionByRange(
            max(spark.sparkContext.defaultParallelism, 8), "term"
        ).sortWithinPartitions("term").write.mode(
            "overwrite"
        ).parquet(dict_path)
    total_tokens = (
        spark.read.schema(DICTIONARY_SCHEMA).parquet(dict_path)
        .agg(F.sum("cf").alias("s")).collect()[0]["s"]
        or 0
    )
    doc_map = spark.read.schema(BUCKETED_SCHEMA).parquet(
        os.path.join(index_dir, "doc_map"))
    # conversation count — BM25F's entity-level N (query/bm25f.py);
    # stamping it here makes n_entities() O(1) at query time instead of a
    # per-store distinct-count over the doc_map
    n_convs = doc_map.select("conv_id").distinct().count()
    fields: dict[str, dict] = {}
    if field_col:
        doc_counts = {
            r[field_col]: r["n"]
            for r in doc_map
            .groupBy(field_col).agg(F.count("*").alias("n")).collect()
        }
        tok_counts = {
            r["field"]: r["s"]
            for r in spark.read.schema(DICTIONARY_SCHEMA).parquet(dict_path)
            .groupBy("field").agg(F.sum("cf").alias("s")).collect()
        }
        fields = {
            str(f): {
                "n_docs": int(nd),
                "avgdl": (float(tok_counts.get(f, 0)) / nd) if nd else 0.0,
            }
            for f, nd in doc_counts.items() if f is not None
        }
    stats = {
        "n_docs": int(n_docs),
        "n_convs": int(n_convs),
        "avgdl": (float(total_tokens) / n_docs) if n_docs else 0.0,
        "tokenizer_version": TOKENIZER_VERSION,
        "k1": params.k1,
        "b": params.b,
        "num_buckets": num_buckets,
        "field_col": field_col,
        "fields": fields,
        "codec": codec,
        # format 2 = flag-prefixed posting buffers (b'V' varint / b'P'
        # pfor).  IndexStore gates on this, so a legacy (unflagged) index
        # fails loudly at OPEN time — never by probabilistically sniffing
        # the first payload byte, whose value 0x56/0x50 a legacy varint
        # buffer can legitimately start with
        "index_format_version": INDEX_FORMAT_VERSION,
    }
    # atomic replace: a concurrent IndexStore open never sees a torn file
    spath = os.path.join(index_dir, "stats.json")
    with open(spath + ".tmp", "w", encoding="utf-8") as f:
        json.dump(stats, f, indent=2, sort_keys=True)
    os.replace(spath + ".tmp", spath)
    return stats


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    num_buckets: int = 32,
    params: BM25Params | None = None,
    fail_after_buckets: int | None = None,
    field_col: str | None = None,
    codec: str = "varint",
    with_positions: bool = True,
) -> dict:
    """Full (or resumed) index build.  Returns build metrics dict.

    ``fail_after_buckets`` is a test hook: stop after writing that many
    buckets (simulates a mid-build crash for the resume test).
    ``field_col`` (e.g. "role") builds field-qualified postings: blocks
    per (bucket, field), per-field stats — field-scoped queries prune at
    the scan; unscoped results are unchanged.
    ``codec``: posting-buffer value codec ("varint" | "pfor"); buffers are
    flag-prefixed, so mixed-codec indexes decode fine.
    ``with_positions`` (default): the FUSED build — one tokenize pass
    emits position blocks carrying the posting metadata too
    (positions.fused_tokenize_positions ``full=True``); the postings
    table then derives from the positions table by a pure columnar copy
    (pos_deltas never read — Parquet column pruning gives the Lucene
    .doc/.pos file split for free).  Tokenizing the corpus once instead
    of twice halves the dominant build cost of a phrase-enabled index;
    at 100 TB it removes a second full corpus read.  Value-identical
    posting blocks by construction (same group arrays, same reduceat —
    tests assert byte equality); ``build_positions`` afterwards is a
    no-op re-stamp.  ``with_positions=False`` restores the postings-only
    pass (maintenance paths that never serve phrases).
    """
    params = params or BM25Params()
    os.makedirs(index_dir, exist_ok=True)
    t0 = time.time()
    phases: dict[str, float] = {}

    def _mark(name: str, since: float) -> float:
        now = time.time()
        phases[name] = round(now - since, 2)
        return now

    doc_map_path = os.path.join(index_dir, "doc_map")
    manifest_path = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(os.path.join(doc_map_path, "_SUCCESS")):
        tp = time.time()
        ranged, offsets, counts = bucketed_corpus(transcripts, num_buckets)
        tp = _mark("bucket_assign", tp)
        manifest = {
            "buckets": {str(p): [offsets[p], counts[p]] for p in sorted(counts)},
            "num_buckets": num_buckets,
            "tokenizer_version": TOKENIZER_VERSION,
        }
        # doc_map is partitioned by bucket: one file per doc-range bucket,
        # so the fused pass reads exactly bucket-whole partitions and a
        # resume prunes to missing bucket directories
        ranged.write.mode("overwrite").partitionBy("bucket").parquet(doc_map_path)
        tp = _mark("doc_map_write", tp)
        with open(manifest_path, "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
    with open(manifest_path, encoding="utf-8") as f:
        manifest = json.load(f)
    counts = {int(b): c for b, (_o, c) in manifest["buckets"].items()}
    n_docs = sum(counts.values())

    all_buckets = sorted(counts)
    done = completed_buckets(spark, index_dir)
    remaining = [b for b in all_buckets if b not in done]
    todo = remaining
    if fail_after_buckets is not None:
        todo = todo[:fail_after_buckets]

    lineage = json.dumps(
        {
            "tokenizer_version": TOKENIZER_VERSION,
            "num_buckets": num_buckets,
            "n_docs": n_docs,
            "source": "transcripts",
            "field_col": field_col,
        },
        sort_keys=True,
    )
    if todo:
        # one partition per doc_map file (= per bucket): disable small-file
        # packing so the fused pass gets bucket-whole partitions and full
        # parallelism — JVM side of this stage is a light parquet decode,
        # which keeps the cores free for the Python tokenize+encode workers
        tp = time.time()
        old_cost = spark.conf.get("spark.sql.files.openCostInBytes", None)
        spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 30))
        try:
            docs = spark.read.schema(BUCKETED_SCHEMA).parquet(doc_map_path)
            if len(todo) != len(all_buckets):
                docs = docs.filter(F.col("bucket").isin(todo))
            if with_positions:
                from anisearch_model_spark.index.positions import (
                    POSITIONS_FULL_SCHEMA,
                    fused_tokenize_positions,
                )

                combined = fused_tokenize_positions(
                    docs, field_col=field_col, codec=codec, full=True)
                pos_root = os.path.join(index_dir, "positions")
                (
                    combined.write.mode("overwrite")
                    .partitionBy("bucket", "field")
                    .option("partitionOverwriteMode", "dynamic")
                    .parquet(pos_root)
                )
                tp = _mark("positions_build", tp)
                # postings = columnar copy of the combined blocks minus
                # pos_deltas (never read — column pruning); zero Python
                pos_blocks = (
                    spark.read.schema(POSITIONS_FULL_SCHEMA)
                    .option("basePath", pos_root).parquet(pos_root)
                )
                if len(todo) != len(all_buckets):
                    pos_blocks = pos_blocks.filter(F.col("bucket").isin(todo))
                postings = pos_blocks.select(
                    "term", "bucket", "field", "block_id", "n", "cf",
                    "first_doc_id", "last_doc_id", "max_tf", "min_dl",
                    "doc_deltas", "tfs", "dls",
                )
            else:
                postings = fused_tokenize_encode(docs, field_col=field_col,
                                                 codec=codec)
            (
                postings.write.mode("overwrite")
                .partitionBy("bucket", "field")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(os.path.join(index_dir, "postings"))
            )
        finally:
            if old_cost is not None:
                spark.conf.set("spark.sql.files.openCostInBytes", old_cost)
        tp = _mark("postings_build", tp)
        _write_checkpoints(spark, index_dir, todo, lineage)
        tp = _mark("checkpoints", tp)
        stats = finalize_metadata(spark, index_dir, n_docs, params, num_buckets,
                                  field_col=field_col, codec=codec)
        _mark("finalize", tp)
        if with_positions and len(todo) == len(remaining):
            # positions commit point — only when this run covered every
            # remaining bucket (a fail_after_buckets partial build leaves
            # the stamp off, exactly like an interrupted build_positions;
            # the resumed build stamps at ITS end)
            from anisearch_model_spark.index.positions import (
                stamp_positions_meta,
            )

            stamp_positions_meta(index_dir, codec, all_buckets, field_col)
    else:
        with open(os.path.join(index_dir, "stats.json"), encoding="utf-8") as f:
            stats = json.load(f)

    elapsed = time.time() - t0
    return {
        "n_docs": n_docs,
        "avgdl": stats["avgdl"],
        "buckets_built": len(todo),
        "buckets_skipped": len(done),
        "elapsed_sec": elapsed,
        "turns_per_sec": n_docs / elapsed if elapsed > 0 else 0.0,
        "phases": phases,
    }
