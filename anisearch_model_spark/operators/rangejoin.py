"""Backward-window range join — attach ALL right rows within a trailing
time window of each left row (the one-to-many sibling of the as-of join's
most-recent-one; the reference, a static catalog engine, has neither).

Semantics: for each left row, every right row of the same ``by`` group
with ``left.on - window_sec < right.on <= left.on``.

A naive theta join (``r.on BETWEEN l.on - w AND l.on``) is a per-group
cross product that Spark executes as BroadcastNestedLoopJoin or a
cartesian — unrunnable at scale.  Here the window is BUCKETIZED: every
row lands in time bucket ``floor(on / window_sec)``; a trailing window of
length w can only overlap a row's own bucket and the one before it, so
the left side fans out to exactly 2 bucket probes and the join becomes an
EQUI-join on (by, bucket) + a residual range filter.  Cost: one shuffle
of 2×|left| + |right| rows on a bounded key — the same plan shape as any
equi-join, AQE-skew-handled, no nested loop anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch(c):
    # TIMESTAMP_NTZ cannot cast straight to double in Spark 4; the
    # session-tz shift from the TIMESTAMP hop cancels between both sides
    return c.cast("timestamp").cast("double")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    window_sec: float,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner backward-window join: one output row per (left, right) match.

    ``left_cols`` / ``right_cols``: payload columns to carry from each
    side (right's are ``right_prefix``-ed).  Timestamps compare at
    sub-second (epoch double) precision; the window is half-open
    ``(l.on - window_sec, l.on]`` so a row exactly ``window_sec`` old is
    excluded but an exact-instant match is included.
    """
    by = list(by)
    w = float(window_sec)
    l_ep = _epoch(F.col(on))
    bucket = F.floor(l_ep / F.lit(w)).cast("long")

    # left probes its bucket and the previous one — a trailing window of
    # length w never spans more than these two
    lpad = left.select(
        *[F.col(c) for c in by],
        l_ep.alias("_l_ep"),
        *[F.col(c) for c in left_cols],
        F.explode(F.array(bucket, bucket - 1)).alias("_bucket"),
    )
    rpad = right.select(
        *[F.col(c) for c in by],
        _epoch(F.col(on)).alias("_r_ep"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right_cols],
        bucket.alias("_bucket"),
    )
    joined = lpad.join(rpad, by + ["_bucket"]).filter(
        (F.col("_r_ep") > F.col("_l_ep") - F.lit(w))
        & (F.col("_r_ep") <= F.col("_l_ep"))
    )
    return joined.drop("_bucket", "_l_ep", "_r_ep")
