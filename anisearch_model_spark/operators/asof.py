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
    # helper columns: one _r_<c> per distinct right column carried over
    # (right_order_col may also be a value column — carry it once)
    carried = list(dict.fromkeys(vals + [right_order_col]))
    lpad = left
    for c in carried:
        lpad = lpad.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    lpad = lpad.withColumn("_side", F.lit(1))

    rsel = [F.col(c) for c in by] + [F.col(on)]
    rsel += [F.col(c).alias(f"_r_{c}") for c in carried]
    rsel += [F.lit(0).alias("_side")]
    rpad = right.select(*rsel)
    # right rows carry only the union schema; left rows keep their payload
    left_cols = [c for c in left.columns]
    for c in left_cols:
        if c not in by + [on]:
            rpad = rpad.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = lpad.unionByName(rpad)

    # side=0 sorts before side=1 at equal `on` → inclusive backward match;
    # right duplicates at one instant resolve to max(right_order_col)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.asc(on), F.asc("_side"), F.asc(f"_r_{right_order_col}"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u
    matched_on = F.last(F.when(F.col("_side") == 0, F.col(on)), ignorenulls=True)
    out = out.withColumn("_matched_on", matched_on.over(w))
    for c in vals:
        out = out.withColumn(
            f"{prefix}{c}",
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w),
        )
    out = out.filter(F.col("_side") == 1)
    if tolerance_sec is not None:
        in_tol = (
            F.unix_timestamp(F.col(on)) - F.unix_timestamp(F.col("_matched_on"))
        ) <= F.lit(float(tolerance_sec))
        for c in vals:
            out = out.withColumn(
                f"{prefix}{c}",
                F.when(in_tol, F.col(f"{prefix}{c}")),
            )
    drop = ["_side", "_matched_on"] + [f"_r_{c}" for c in carried]
    return out.drop(*drop)
