"""Deterministic sampling and mixing operators for training-data
pipelines.

A 100 TB corpus is never trained on whole: pipelines draw stratified
samples (exact per-stratum counts, reproducible across runs and cluster
sizes) and fill per-source token budgets (data-mixture curricula).  Both
operators here are deterministic functions of (data, seed) — no RNG
state, no partition-order dependence — so a re-run, a resume, or a
different executor count yields the SAME sample, which is what makes
training runs comparable.  The reference's sampling is
`DataFrame.sample(n=..., random_state=...)` driver-side pandas
(`/root/reference/src/custom_transformers.py` usage and
`src/merge_datasets.py` negative-pair draws); hash-ordered selection is
the distributed replacement (same spirit as Spark's `sampleBy`, but
EXACT counts and portable ordering).

Scale notes:
  * stratified_sample's expensive step is a per-stratum top-n by hash.
    The naive plan (one window over everything) shuffles the full corpus
    on the stratum key — a hot stratum lands on one task.  Instead a
    map-side partial top-n (each input partition keeps ≤ n rows per
    stratum it sees, vectorized pandas) bounds the shuffle to
    ≤ n · partitions rows per stratum; the global cut then windows over
    that small survivor set.  This is the groupBy-combine shape, applied
    to order statistics.
  * token_budget_mix is one window per group (cumulative sum) over rows
    ALREADY reduced to (group, id, weight) — the wide payload joins back
    after selection by semi-join, so the shuffle moves key columns, not
    documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_col(id_col: str, seed: int):
    """Portable deterministic order: md5 of seed:id — identical text in
    any engine (the SQL oracle mirrors it verbatim)."""
    return F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))


def stratified_sample(df: DataFrame, strata_col: str, n: int,
                      id_col: str, seed: int = 42,
                      exact: bool = True) -> DataFrame:
    """Exactly ``n`` rows per stratum (fewer if the stratum is smaller),
    chosen by ascending md5(seed:id) — deterministic, uniform in
    expectation, reproducible at any parallelism.

    ``exact=True`` (default) runs the two-phase plan: map-side partial
    top-n per stratum per partition, then the global window over the
    ≤ n·partitions survivors.  ``exact=False`` skips the partial phase
    (the single-window naive plan) — only for tests/oracles comparing
    the two.
    """
    sel = df.select(strata_col, id_col).withColumn(
        "_h", _hash_col(id_col, seed)
    )
    if exact:
        schema = sel.schema

        def partial_topn(pdfs):
            for pdf in pdfs:
                if len(pdf):
                    yield (
                        pdf.sort_values("_h", kind="mergesort")
                        .groupby(strata_col, sort=False)
                        .head(n)
                    )

        sel = sel.mapInPandas(partial_topn, schema=schema)
    w = Window.partitionBy(strata_col).orderBy(F.asc("_h"), F.asc(id_col))
    picked = (
        sel.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .select(id_col)
    )
    # semi-join returns the full-width rows; the shuffle above only ever
    # moved (strata, id, hash)
    return df.join(picked, id_col, "left_semi")


def token_budget_mix(df: DataFrame, group_col: str, weight_col: str,
                     budget: int, order_col: str,
                     id_col: str, descending: bool = True) -> DataFrame:
    """Greedy per-group budget fill: walk each group's rows in
    (order_col DESC|ASC, id ASC) priority order, keeping rows while the
    group's cumulative ``weight_col`` stays ≤ ``budget``.

    The data-mixture primitive: per language/source, take the
    highest-quality documents until that group's token budget is full.
    A row that would overflow the budget is dropped (and so is
    everything after it in that group) — the greedy prefix rule, exactly
    mirrorable as a windowed cumulative sum in SQL.
    """
    order = [F.desc(order_col) if descending else F.asc(order_col),
             F.asc(id_col)]
    w = Window.partitionBy(group_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # dict-dedupe: order_col == weight_col (budget by the priority metric
    # itself) must not produce a duplicate-name projection
    slim = df.select(*dict.fromkeys([group_col, id_col, weight_col,
                                     order_col]))
    picked = (
        slim.withColumn("_cum", F.sum(weight_col).over(w))
        .filter(F.col("_cum") <= budget)
        .select(id_col, F.col("_cum").alias("cum_weight"))
    )
    return df.join(picked, id_col, "inner")
