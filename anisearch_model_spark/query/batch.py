"""Batch query-set evaluation: score MANY queries in ONE distributed job.

The reference serves one query per request (rate-limited to 1 req/s,
``src/api.py:160``) and reloads the model per request (``:409``).  For
offline evaluation over a query-set table this is re-expressed as a single
plan: broadcast the (query_id, term, idf) table, join it against the
postings scan ONCE, fold per (query_id, doc_id) with the fixed
ascending-term summation order, and take per-query top-k with one window —
postings are read once regardless of query count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from anisearch_model_spark.config import BM25Params
from anisearch_model_spark.functions.normalize import bm25_idf, bm25_term_score, tokenize_series
from anisearch_model_spark.query.engine import IndexStore


def batch_topk(index: IndexStore, queries: pd.DataFrame, k: int = 10,
               params: BM25Params | None = None) -> DataFrame:
    """queries: pandas (query_id, query_text) → DataFrame
    (query_id, rank, doc_id, score), rank-identical per query to the
    single-query engine/oracle."""
    params = params or BM25Params()
    spark = index.spark
    avgdl = float(index.stats["avgdl"])
    n_docs = int(index.stats["n_docs"])
    k1, b = params.k1, params.b

    # driver-side query tokenize (shared contract): (query_id, term)
    tokenized = tokenize_series(queries["query_text"])
    qt_rows = [
        (int(qid), t)
        for qid, toks in zip(queries["query_id"], tokenized)
        for t in sorted(set(toks))
    ]
    empty = spark.createDataFrame([], "query_id long, rank long, doc_id long, score double")
    if not qt_rows:
        return empty
    all_terms = sorted({t for _, t in qt_rows})

    dfs = index.term_dfs(all_terms)
    idf = {t: float(bm25_idf(np.array([df]), n_docs)[0]) for t, df in dfs.items()}
    qt_rows = [(q, t) for q, t in qt_rows if t in idf]
    if not qt_rows:
        return empty
    qterms = spark.createDataFrame(qt_rows, "query_id long, term string")

    bidf = spark.sparkContext.broadcast(idf)
    blocks = index.postings.filter(F.col("term").isin(sorted(idf.keys())))

    def decode(batches):
        from anisearch_model_spark.index.codec import decode_posting_block

        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                d, t, dl = decode_posting_block(
                    {"first_doc_id": row.first_doc_id,
                     "doc_deltas": row.doc_deltas, "tfs": row.tfs, "dls": row.dls})
                ps = bm25_term_score(
                    t, dl, np.full(len(t), bidf.value[row.term]), avgdl, k1, b)
                outs.append(pd.DataFrame({"doc_id": d, "term": row.term, "pscore": ps}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    partials = blocks.select(
        "term", "first_doc_id", "doc_deltas", "tfs", "dls"
    ).mapInPandas(decode, schema="doc_id long, term string, pscore double")

    scored = (
        partials.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "pscore"))),
                F.lit(0.0),
                lambda acc, x: acc + x["pscore"],
            ).alias("score")
        )
    )
    tomb = index.tombstones
    if len(tomb):
        tdf = spark.createDataFrame([(int(t),) for t in tomb], "doc_id long")
        scored = scored.join(F.broadcast(tdf), "doc_id", "left_anti")
    # limit-FIRST: reduce each partition to its local per-query top-k
    # (running heap across the partition's Arrow batches, k×|queries| rows
    # of state) BEFORE the rank window — the window then sorts
    # ≤ k × |queries| × |partitions| rows instead of every matching
    # (query, doc) pair.  (score DESC, doc_id ASC) is a total order, so
    # the local cut is exact, same discipline as TakeOrderedAndProject.
    def local_topk(batches):
        best: dict[int, pd.DataFrame] = {}
        for pdf in batches:
            for qid, g in pdf.groupby("query_id", sort=False):
                cur = best.get(qid)
                m = pd.concat([cur, g], ignore_index=True) if cur is not None else g
                best[qid] = m.sort_values(
                    ["score", "doc_id"], ascending=[False, True],
                    kind="mergesort",
                ).head(k)
        if best:
            yield pd.concat(best.values(), ignore_index=True)

    reduced = scored.mapInPandas(
        local_topk, schema="query_id long, doc_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        reduced.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
