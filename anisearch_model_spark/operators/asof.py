"""As-of (backward, inclusive) join — a training-pipeline staple Spark has
no built-in for (pandas has ``merge_asof``; the reference, being a static
catalog engine, has neither).

Semantics: for each LEFT row, attach the most recent RIGHT row of the same
``by`` group with ``right.on <= left.on`` (optionally within ``tolerance``
seconds).  Ties on ``on`` match (inclusive); duplicate right rows at the
same instant resolve deterministically to the one with the greatest
``right_order_col``.

Implementation is the union–window trick, NOT a range join:

    tag sides → unionByName → one window per right payload column:
    ``last(value, ignorenulls=True)`` over
    (PARTITION BY by ORDER BY on, side, order_col
     ROWS UNBOUNDED PRECEDING..CURRENT) → keep left rows.

Cost: ONE shuffle on the ``by`` key and a per-group sort — the same plan
shape as any windowed aggregation.  A naive ``left.on >= right.on`` range
join explodes to |left|×|right| per group before picking the max;
at 100 TB the union–window form is the difference between a bounded
sort-based stage and an unrunnable cross product.  Skewed ``by`` keys are
the same skew problem as any window (AQE / salting applies unchanged).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    right_order_col: str,
    tolerance_sec: float | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """left + ``prefix``-ed right value columns (null when no match).

    ``right_order_col``: a right column totally ordering duplicates at the
    same (by, on) instant — the greatest wins (explicit tie-break, never
    emission order).  ``tolerance_sec``: matches older than this many
    seconds before ``left.on`` are nulled out.
    """
    by = list(by)
    vals = list(value_cols)
    # the whole right row rides in ONE struct, so every attached column
    # (and the tolerance anchor) comes from the SAME matched right row —
    # per-column last(ignorenulls) would skip a right row whose value is
    # genuinely NULL and stitch together values from different rows
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

    # side=0 sorts before side=1 at equal `on` → inclusive backward match;
    # right duplicates at one instant resolve to max(right_order_col)
    # (nulls-first asc keeps left rows out of the _ord tie-break)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.asc(on), F.asc("_side"), F.asc_nulls_first("_ord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.withColumn("_m", F.last("_r_row", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    matched = F.col("_m")
    if tolerance_sec is not None:
        # cast-to-double keeps sub-second precision (unix_timestamp
        # truncates to whole seconds); the anchor is the matched row's own
        # `on`, so tolerance and values always agree on which row matched.
        # TIMESTAMP_NTZ has no direct double cast — route through
        # TIMESTAMP (same session-tz shift on both sides, so it cancels)
        def _epoch(c):
            return c.cast("timestamp").cast("double")

        in_tol = (
            _epoch(F.col(on)) - _epoch(matched["_on"])
        ) <= F.lit(float(tolerance_sec))
        matched = F.when(in_tol, F.col("_m"))
    for c in vals:
        out = out.withColumn(f"{prefix}{c}", matched[c])
    return out.drop("_side", "_r_row", "_ord", "_m")
