"""Distributed IR relevance evaluation: NDCG@k, MRR@k, precision@k,
recall@k over (results, qrels) tables.

A retrieval engine at 100 TB is tuned by measuring ranked-list quality
over large query logs, not by eyeballing ten results.  The reference
evaluates its model with a driver-side per-query loop
(`/root/reference/src/test.py:221-274` scores one query at a time and
appends a JSON record); this operator is the distributed replacement:
metrics for MILLIONS of queries in one pass, as a pure DataFrame
program (joins + windows + aggregates — no Python in the hot path, no
driver iteration).

Inputs
------
results : (query_id, doc_id, rank)   rank is 1-based; rows with
          rank > k are ignored, so callers can pass deeper lists.
qrels   : (query_id, doc_id, grade)  grade > 0 means relevant; graded
          (non-binary) judgments feed the 2^grade - 1 DCG gain.

Output: one row per query_id present in `results`:
  (query_id, ndcg, mrr, precision_k, recall_k), each rounded to 4
  decimals.  Queries with no relevant documents anywhere in qrels get
  ndcg = mrr = recall_k = 0.0.

Scale shape
-----------
* results is <= k rows per query, so the hit join moves k * |queries|
  rows — one shuffle on (query_id, doc_id).
* the ideal-gain window partitions qrels by query_id; judgment lists
  are bounded per query in practice (human or rule-derived qrels are
  O(100) deep).  If a rule-derived qrels table is corpus-sized for a
  hot query, pre-prune it map-side with a per-partition top-k on grade
  before calling in — the same combine shape stratified_sample uses.
* final metric rows are one per query: tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def relevance_metrics(results: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Per-query NDCG@k / MRR@k / precision@k / recall@k.

    Deterministic: the ideal ranking breaks grade ties by doc_id ASC,
    so IDCG (and hence NDCG) is reproducible across runs and engines.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    r = results.select("query_id", "doc_id", "rank").filter(F.col("rank") <= k)
    q = qrels.select("query_id", "doc_id", "grade").filter(F.col("grade") > 0)

    # realized gains: grade of each returned doc (0 when unjudged/irrelevant)
    hits = r.join(q, ["query_id", "doc_id"], "left").withColumn(
        "grade", F.coalesce(F.col("grade"), F.lit(0))
    )
    gain = (F.pow(F.lit(2.0), F.col("grade")) - 1.0) / F.log2(F.col("rank") + 1.0)
    ragg = hits.groupBy("query_id").agg(
        F.sum(gain).alias("dcg"),
        F.max(
            F.when(F.col("grade") > 0, 1.0 / F.col("rank")).otherwise(F.lit(0.0))
        ).alias("rr"),
        F.sum(F.when(F.col("grade") > 0, 1).otherwise(0)).alias("hits_k"),
    )

    # ideal gains: qrels ranked by grade DESC (doc_id ASC tie-break),
    # truncated to k; rel_total comes from the same pass
    w = Window.partitionBy("query_id").orderBy(F.desc("grade"), F.asc("doc_id"))
    ideal = q.withColumn("irank", F.row_number().over(w))
    iagg = ideal.groupBy("query_id").agg(
        F.sum(
            F.when(
                F.col("irank") <= k,
                (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
                / F.log2(F.col("irank") + 1.0),
            )
        ).alias("idcg"),
        F.count("*").alias("rel_total"),
    )

    out = ragg.join(iagg, "query_id", "left")
    return out.select(
        "query_id",
        F.round(
            F.when(
                F.col("idcg").isNotNull() & (F.col("idcg") > 0),
                F.col("dcg") / F.col("idcg"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("ndcg"),
        F.round(F.col("rr"), 4).alias("mrr"),
        F.round(F.col("hits_k") / F.lit(float(k)), 4).alias("precision_k"),
        F.round(
            F.coalesce(F.col("hits_k") / F.col("rel_total"), F.lit(0.0)), 4
        ).alias("recall_k"),
    ).orderBy("query_id")
