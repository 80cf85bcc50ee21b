"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState``.

The batch sessionizer (events_sessionize entry) needs the whole history;
this is the STREAMING form: per-user session state lives in the state
store, sessions that span micro-batches merge, and a session is emitted
exactly when it becomes WATERMARK-FINAL — the event-time watermark has
passed ``session_end + gap``, so no admissible future event can extend
or bridge it (closing any earlier, e.g. on the arrival of a post-gap
later event, can fragment sessions a batch run would merge whenever
``late_tolerance > gap``).  The watermark advance that finalizes a
session reaches the operator either with that user's next event or via
event-time TIMEOUT (no further events needed).  Emission is append-only
and exactly-once under the checkpoint.

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
# LIST-valued state: ALL of a user's not-yet-watermark-final session
# intervals, parallel arrays sorted by start.  A single-interval state
# would have to close earlier intervals the moment a later event arrives
# — but an interval is only FINAL once the watermark passes its
# end + gap (any admitted future event has ts >= watermark, so only then
# can nothing merge with or bridge into it).  Closing earlier emits
# fragments a batch sessionizer would have merged (e.g. two pre-gap late
# events landing in separate micro-batches within the gap of each other).
_STATE_SCHEMA = "starts array<long>, lasts array<long>, ns array<long>"


def _session_fn(gap_ms: int):
    import pandas as pd

    def fn(key, pdfs, state):
        (user_id,) = key
        wm = state.getCurrentWatermarkMs()
        # Sessionize as an INTERVAL MERGE: stored intervals plus each
        # batch event as a point interval; sort by start and coalesce
        # neighbors within the gap.  This lets a late-but-within-
        # watermark event extend a session backwards, start its own
        # earlier session (pre-gap late event), or BRIDGE two stored
        # intervals into one.
        intervals: list[tuple[int, int, int]] = []
        if state.exists:
            starts, lasts, ns = state.get
            intervals += [(int(s), int(l), int(n))
                          for s, l, n in zip(starts, lasts, ns)]
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs)).sort_values("ts")
            ts_ms = (rows["ts"].astype("int64") // 1_000_000).tolist()
            intervals += [(t, t, 1) for t in ts_ms]
        intervals.sort()
        merged: list[tuple[int, int, int]] = []
        for s, e, cnt in intervals:
            if merged and s - merged[-1][1] <= gap_ms:
                ps, pe, pn = merged[-1]
                merged[-1] = (ps, max(pe, e), pn + cnt)
            else:
                merged.append((s, e, cnt))
        # close EXACTLY the watermark-final intervals: end + gap < wm
        # means every admissible future event (ts >= wm) is > gap past
        # the end and > gap past the start, so the interval can neither
        # be extended nor bridged — it is the batch-sessionizer result
        closed = [iv for iv in merged if iv[1] + gap_ms < wm]
        kept = [iv for iv in merged if iv[1] + gap_ms >= wm]
        if kept:
            state.update((
                [s for s, _l, _n in kept],
                [l for _s, l, _n in kept],
                [n for _s, _l, n in kept],
            ))
            # event-time timeout: wake when the EARLIEST kept interval
            # becomes final (must stay strictly above the watermark)
            state.setTimeoutTimestamp(
                max(min(l + gap_ms for _s, l, _n in kept), wm + 1)
            )
        elif state.exists:
            state.remove()
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
