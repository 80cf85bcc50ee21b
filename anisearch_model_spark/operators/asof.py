"""As-of join — a training-pipeline staple Spark has no built-in for
(pandas has ``merge_asof``; the reference, being a static catalog engine,
has neither).

Semantics (pandas-merge_asof parity, property-tested against it): for
each LEFT row attach ONE right row of the same ``by`` group —

  * ``backward`` (default): the most recent with ``right.on <= left.on``;
  * ``forward``: the earliest with ``right.on >= left.on``;
  * ``nearest``: whichever of the two is closer (ties → backward);

optionally within ``tolerance_sec``.  Ties on ``on`` match (inclusive);
duplicate right rows at the same instant resolve deterministically via
``right_order_col`` (backward: greatest wins = merge_asof's last-sorted;
forward: smallest wins = merge_asof's first-sorted).

Implementation is the union–window trick, NOT a range join:

    tag sides → unionByName → the whole right row rides in ONE struct →
    ``last(row, ignorenulls=True)`` over
    (PARTITION BY by ORDER BY on, side, order_col
     ROWS UNBOUNDED PRECEDING..CURRENT) → keep left rows
    (forward = the same window over the reversed ordering).

Cost: ONE shuffle on the ``by`` key and a per-group sort — the same plan
shape as any windowed aggregation (nearest adds a second sort over the
same exchange).  A naive ``left.on >= right.on`` range join explodes to
|left|×|right| per group before picking the max; at 100 TB the
union–window form is the difference between a bounded sort-based stage
and an unrunnable cross product.  Skewed ``by`` keys are the same skew
problem as any window (AQE / salting applies unchanged).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _epoch(c):
    # TIMESTAMP_NTZ cannot cast straight to double in Spark 4; the
    # session-tz shift from the TIMESTAMP hop cancels between both sides
    return c.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    right_order_col: str,
    tolerance_sec: float | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """left + ``prefix``-ed right value columns (null when no match).

    The matched right row rides as ONE struct, so every attached column
    (and the tolerance anchor) comes from the SAME row — per-column
    last(ignorenulls) would skip a right row whose value is genuinely
    NULL and stitch together values from different rows.
    ``right_order_col``: a right column totally ordering duplicates at
    the same (by, on) instant.  ``tolerance_sec``: matches farther than
    this many seconds from ``left.on`` are nulled out (sub-second
    precise).  ``direction``: backward | forward | nearest.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    by = list(by)
    vals = list(value_cols)
    carried = list(dict.fromkeys(vals + [right_order_col]))
    row_type = (
        "struct<_on:" + right.schema[on].dataType.simpleString()
        + "".join(f",{c}:{right.schema[c].dataType.simpleString()}"
                  for c in carried) + ">"
    )
    lpad = (
        left.withColumn("_r_row", F.lit(None).cast(row_type))
        .withColumn("_ord", F.lit(None).cast(right.schema[right_order_col].dataType))
        .withColumn("_side", F.lit(1))
    )

    rsel = [F.col(c) for c in by] + [F.col(on)]
    rsel += [
        F.struct(F.col(on).alias("_on"),
                 *[F.col(c).alias(c) for c in carried]).alias("_r_row"),
        F.col(right_order_col).alias("_ord"),
        F.lit(0).alias("_side"),
    ]
    rpad = right.select(*rsel)
    # right rows carry only the union schema; left rows keep their payload
    left_cols = [c for c in left.columns]
    for c in left_cols:
        if c not in by + [on]:
            rpad = rpad.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = lpad.unionByName(rpad)

    # backward: ascending scan — side=0 sorts before side=1 at equal `on`
    # (inclusive), right duplicates at one instant resolve to the GREATEST
    # order_col (last seen wins under last()).  forward: the same window
    # over the REVERSED ordering — ord DESC makes the SMALLEST order_col
    # the last seen, matching merge_asof's first-of-the-sorted-frame.
    # nulls-first asc / nulls-last desc keep left rows out of the
    # _ord tie-break either way.
    w_back = (
        Window.partitionBy(*by)
        .orderBy(F.asc(on), F.asc("_side"), F.asc_nulls_first("_ord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(F.desc(on), F.asc("_side"), F.desc_nulls_first("_ord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def within_tol(m, dist):
        if tolerance_sec is None:
            return m
        return F.when(dist <= F.lit(float(tolerance_sec)), m)

    l_ep = _epoch(F.col(on))
    if direction == "backward":
        out = u.withColumn("_m", F.last("_r_row", ignorenulls=True).over(w_back))
        matched = within_tol(F.col("_m"), l_ep - _epoch(F.col("_m")["_on"]))
    elif direction == "forward":
        out = u.withColumn("_m", F.last("_r_row", ignorenulls=True).over(w_fwd))
        matched = within_tol(F.col("_m"), _epoch(F.col("_m")["_on"]) - l_ep)
    else:  # nearest: both scans over the same exchange, closer one wins,
        # ties (equal distance) go to the backward match — merge_asof's rule
        out = (
            u.withColumn("_mb", F.last("_r_row", ignorenulls=True).over(w_back))
            .withColumn("_mf", F.last("_r_row", ignorenulls=True).over(w_fwd))
        )
        mb = within_tol(F.col("_mb"), l_ep - _epoch(F.col("_mb")["_on"]))
        mf = within_tol(F.col("_mf"), _epoch(F.col("_mf")["_on"]) - l_ep)
        dist_b = l_ep - _epoch(mb["_on"])
        dist_f = _epoch(mf["_on"]) - l_ep
        matched = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(dist_b <= dist_f, mb)
            .otherwise(mf)
        )
    out = out.filter(F.col("_side") == 1)
    for c in vals:
        out = out.withColumn(f"{prefix}{c}", matched[c])
    drop = ["_side", "_r_row", "_ord"] + (
        ["_mb", "_mf"] if direction == "nearest" else ["_m"]
    )
    return out.drop(*drop)
