"""Stable docID assignment (doc_map).

The reference has NO stable document identity — its embedding matrix row i
is positionally aligned with corpus DataFrame row i and looked up with
``df.iloc[idx]`` (``src/api.py:430-431``), which silently breaks under any
re-sort.  Here identity is explicit and partition-independent:

    doc_id = rank of (conv_id, turn_idx) in global lexicographic order.

At 10^12-turn scale a single ``row_number() OVER (ORDER BY ...)`` window is
a one-reducer sort, so we implement zipWithIndex semantics instead:
range-partition by the key, sort within partitions, count rows per
partition (one cheap pass), then add cumulative offsets in a second pass.
The assignment depends only on the key ordering — identical across
parallelism levels, which is what makes BM25 ranks reproducible between
local[8] and local[32] (north-rule scaling criterion).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC_MAP_SCHEMA = (
    "doc_id long, conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def assign_doc_ids(transcripts: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → + doc_id.

    Deterministic: doc_id is the dense 0-based rank under
    ``ORDER BY conv_id, turn_idx`` regardless of input partitioning or
    cluster size.
    """
    spark = transcripts.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 1)

    ranged = (
        transcripts.repartitionByRange(num_partitions, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boffsets = spark.sparkContext.broadcast(offsets)

    out_schema = DOC_MAP_SCHEMA

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if pdf.empty:
                continue
            pid = int(pdf["_pid"].iloc[0])
            start = boffsets.value[pid] + local
            pdf = pdf.copy()
            pdf["doc_id"] = range(start, start + len(pdf))
            local += len(pdf)
            yield pdf[
                ["doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
            ]

    return ranged.mapInPandas(add_ids, schema=out_schema)
