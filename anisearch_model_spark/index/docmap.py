"""Stable docID assignment + deterministic doc-range bucketing (doc_map).

The reference has NO stable document identity — its embedding matrix row i
is positionally aligned with corpus DataFrame row i and looked up with
``df.iloc[idx]`` (``src/api.py:430-431``), which silently breaks under any
re-sort.  Here identity is explicit and partition-independent:

    doc_id = rank of (conv_id, turn_idx) in global lexicographic order.

At 10^12-turn scale a single ``row_number() OVER (ORDER BY ...)`` window is
a one-reducer sort, so we implement zipWithIndex semantics over an
explicitly DETERMINISTIC range bucketing:

  1. boundary sample: rows where xxhash64(conv_id, turn_idx) % k == 0 —
     a deterministic pseudo-random sample (Spark's own RangePartitioner
     seeds its sampler with the RDD id, so its boundaries change between
     runs; ours are a pure function of the data);
  2. boundaries = every (sample/num_buckets)-th sampled key, sorted on
     the driver (sample size ≈ 128·num_buckets keys — bounded);
  3. bucket = #boundaries ≤ (conv_id, turn_idx)  — vectorized
     searchsorted inside a pandas UDF against broadcast boundaries;
  4. ONE hash shuffle on bucket co-locates each whole bucket;
  5. per-partition: sort each bucket by (conv_id, turn_idx), add
     offsets[bucket] (cumulative counts, from one cheap count pass).

The assignment — and the bucket layout — depend only on the key ordering:
identical across parallelism levels AND across re-runs, which is what
makes resumable builds and local[8]-vs-local[32] rank identity possible.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC_MAP_SCHEMA = (
    "doc_id long, conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

BUCKETED_SCHEMA = DOC_MAP_SCHEMA + ", bucket int"

_SAMPLE_PER_BUCKET = 128


def _boundaries(transcripts: DataFrame, num_buckets: int) -> list[tuple[str, int]]:
    """num_buckets-1 deterministic split keys (ascending)."""
    if num_buckets <= 1:
        return []
    total = transcripts.count()
    target_sample = _SAMPLE_PER_BUCKET * num_buckets
    k = max(1, total // max(target_sample, 1))
    sampled = (
        transcripts.select("conv_id", "turn_idx")
        .filter(F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(k)) == 0)
        .collect()
    )
    keys = sorted((r["conv_id"], r["turn_idx"]) for r in sampled)
    if len(keys) < num_buckets:
        return keys[:-1] if keys else []
    step = len(keys) / num_buckets
    return [keys[int(i * step)] for i in range(1, num_buckets)]


def _bucket_of(conv: np.ndarray, turn: np.ndarray,
               bounds: list[tuple[str, int]]) -> np.ndarray:
    """Vectorized bucket = bisect_right(bounds, (conv, turn)).

    The turn tie-break for rows whose conv EQUALS a boundary conv is one
    searchsorted per distinct colliding boundary conv (≤ num_buckets of
    them), never a per-row Python loop — boundary convs are popular keys
    by construction (they were sampled), so the colliding row count can
    be large even when the distinct-conv count is tiny."""
    if not bounds:
        return np.zeros(len(conv), dtype="int32")
    b_conv = np.array([b[0] for b in bounds], dtype=object)
    lo = np.searchsorted(b_conv, conv, side="left")
    hi = np.searchsorted(b_conv, conv, side="right")
    out = hi.astype("int32")
    eq = np.nonzero(lo < hi)[0]
    if len(eq):
        b_turn = np.array([b[1] for b in bounds], dtype="int64")
        turn_eq = turn.astype("int64")
        for l in np.unique(lo[eq]):
            m = eq[lo[eq] == l]
            h = int(hi[m[0]])
            out[m] = l + np.searchsorted(
                b_turn[int(l):h], turn_eq[m], side="right"
            )
    return out


def bucketed_corpus(
    transcripts: DataFrame, num_buckets: int
) -> tuple[DataFrame, dict[int, int], dict[int, int]]:
    """→ (cached bucketed+doc_id'd DataFrame, offsets, counts).

    The returned DataFrame has BUCKETED_SCHEMA; every bucket's rows are
    whole within one partition, sorted by (conv_id, turn_idx), with
    doc_id = global rank.  PERSISTED — caller unpersists via
    ``df._cached_parent``.
    """
    spark = transcripts.sparkSession
    bounds = _boundaries(transcripts, num_buckets)
    bbounds = spark.sparkContext.broadcast(bounds)

    def add_bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.copy()
            pdf["bucket"] = _bucket_of(
                pdf["conv_id"].to_numpy(dtype=object),
                pdf["turn_idx"].to_numpy(),
                bbounds.value,
            )
            yield pdf

    in_schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    with_bucket = transcripts.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ).mapInPandas(add_bucket, schema=in_schema + ", bucket int")

    shuffled = with_bucket.repartition(num_buckets, "bucket").persist()

    counts = {
        int(r["bucket"]): r["cnt"]
        for r in shuffled.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
    }
    for b in range(num_buckets):
        counts.setdefault(b, 0)
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    boffsets = spark.sparkContext.broadcast(offsets)

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # buffer the partition: buckets may interleave across Arrow batches
        parts = [pdf for pdf in batches if not pdf.empty]
        if not parts:
            return
        whole = pd.concat(parts, ignore_index=True)
        whole = whole.sort_values(
            ["bucket", "conv_id", "turn_idx"], kind="mergesort"
        ).reset_index(drop=True)
        local_rank = whole.groupby("bucket", sort=False).cumcount()
        whole["doc_id"] = (
            whole["bucket"].map(boffsets.value).astype("int64") + local_rank
        )
        yield whole[
            ["doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts", "bucket"]
        ]

    with_ids = shuffled.mapInPandas(add_ids, schema=BUCKETED_SCHEMA)
    with_ids._cached_parent = shuffled
    return with_ids, offsets, counts


def assign_doc_ids(transcripts: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → + doc_id.

    Deterministic: doc_id is the dense 0-based rank under
    ``ORDER BY conv_id, turn_idx`` regardless of input partitioning,
    cluster size, or run (see module docstring).
    """
    spark = transcripts.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 1)
    with_ids, _offsets, _counts = bucketed_corpus(transcripts, num_partitions)
    out = with_ids.drop("bucket")
    out._cached_parent = with_ids._cached_parent
    return out