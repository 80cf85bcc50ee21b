"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState``.

The batch sessionizer (events_sessionize entry) needs the whole history;
this is the STREAMING form: per-user session state lives in the state
store, sessions that span micro-batches merge, a session closes either
when a later event arrives past the inactivity gap (emitted in that
batch) or when the event-time watermark passes ``last_ts + gap``
(event-time TIMEOUT — emitted without needing another event from that
user).  Emission is append-only and exactly-once under the checkpoint.

Scale shape: state is one tiny row per ACTIVE user (bounded by the gap
horizon, not stream length); the shuffle key is user_id (naturally flat);
the per-group work is a vectorized pandas pass over that user's batch
slice.  This is the ``applyInPandasWithState`` pattern the Structured
Streaming guide prescribes for custom stateful logic that windowed aggs
can't express (sessions have data-dependent, not fixed, boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from anisearch_model_spark.streaming.windowed import EVENT_SCHEMA

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
_STATE_SCHEMA = "start_ms long, last_ms long, n long"


def _session_fn(gap_ms: int):
    import pandas as pd

    def fn(key, pdfs, state):
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id],
                 "session_start": [pd.Timestamp(start_ms, unit="ms")],
                 "session_end": [pd.Timestamp(last_ms, unit="ms")],
                 "n_events": [n]}
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_ms = (rows["ts"].astype("int64") // 1_000_000).tolist()
        # Sessionize as an INTERVAL MERGE: the stored open session is a
        # (start, end, n) interval, each batch event a point interval;
        # sort by start and coalesce neighbors within the gap.  This
        # both lets a late-but-within-watermark event extend the open
        # session backwards AND closes a pre-gap late event (older than
        # session_start by more than the gap, reachable whenever
        # late_tolerance > gap) as its own earlier session instead of
        # absorbing it into a session spanning a silence longer than
        # the gap.
        intervals = [(t, t, 1) for t in ts_ms]
        if state.exists:
            intervals.append(tuple(state.get))
        intervals.sort()
        merged: list[tuple[int, int, int]] = []
        for s, e, cnt in intervals:
            if merged and s - merged[-1][1] <= gap_ms:
                ps, pe, pn = merged[-1]
                merged[-1] = (ps, max(pe, e), pn + cnt)
            else:
                merged.append((s, e, cnt))
        # all but the latest interval are already gap-separated in the
        # past — close them now; the latest stays open in state
        closed = merged[:-1]
        start_ms, last_ms, n = merged[-1]
        state.update((start_ms, last_ms, n))
        # event-time timeout: flush the open session once the watermark
        # passes last_ms + gap (must stay strictly above the watermark)
        state.setTimeoutTimestamp(
            max(last_ms + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield pd.DataFrame(
                {"user_id": [user_id] * len(closed),
                 "session_start": [pd.Timestamp(s, unit="ms") for s, _l, _n in closed],
                 "session_end": [pd.Timestamp(l, unit="ms") for _s, l, _n in closed],
                 "n_events": [int(nn) for _s, _l, nn in closed]}
            )

    return fn


def sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    late_tolerance: str = "1 minute",
) -> None:
    """Drain available event files into closed-session rows under
    ``out_dir`` (parquet, append-only, exactly-once)."""
    import pandas as pd

    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
    sessions = (
        stream.withWatermark("ts", late_tolerance)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
    q = (
        sessions.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def closed_sessions(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir).orderBy(
        "user_id", "session_start"
    )
