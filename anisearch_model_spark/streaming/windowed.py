"""Streaming windowed aggregation with event-time watermarks.

The reference has no streaming surface at all; a web-scale transcript
pipeline needs one for operational rollups (events/sec by type, value
sums) over late-arriving data.  Shape:

    readStream (file source, schema pinned)
      → withWatermark(ts, <late tolerance>)
      → groupBy(window(ts, <size>), keys).agg(...)
      → writeStream append (only FINALIZED windows emit — the watermark
        closes a window when event time passes window_end + tolerance)

``Trigger.AvailableNow`` drains the current backlog then stops, so the
same entry point serves batch-style backfills and incremental runs; the
checkpoint makes re-runs exactly-once (already-emitted windows are not
re-emitted).

At scale the state store holds one row per (open window × key) — bounded
by the watermark horizon, not the stream length; keys here are low-
cardinality event types so the stateful shuffle is flat.  Late rows
beyond the tolerance are DROPPED by contract (counted nowhere), matching
Spark's append-mode watermark semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_size: str = "1 hour",
    late_tolerance: str = "30 minutes",
) -> None:
    """Drain available event files into finalized per-(window, type)
    rollups under ``out_dir`` (parquet, append-only)."""
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
    agg = (
        stream.withWatermark("ts", late_tolerance)
        .groupBy(F.window("ts", window_size).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type", "n", "total_value",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def finalized_windows(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)
