"""Faceted search: aggregate counts over the FULL BM25 match set.

The Lucene/Solr facet contract: alongside the ranked page, report for a
chosen metadata dimension (here any doc_map column — ``role``, or
conv-level attributes joined in by the caller) how the *entire* match
set distributes over that dimension, so a UI can offer drill-down
filters.  The reference exposes the same shape one level up — its API
groups results per synopsis column and reports per-column result counts
(``/root/reference/src/api.py:338-349``) — but only over the truncated
top-k pool; real facets must count the whole match set, which a
single-node engine cannot afford and a distributed one can.

Scale shape: the match set is query-term posting volume (never corpus
size — the postings scan term-IN-prunes), the facet join is an equi-join
on doc_id against the doc_map, and the output is |distinct facet
values| rows.  Both sides of the join are bucketed by the SAME doc-range
scheme (index/build.py assigns bucket = doc_id range for postings and
doc_map alike), so on a real cluster a storage-bucketed join co-locates
them without a shuffle; in local mode AQE picks a plain sort-merge or
broadcast by size.  The groupBy is a map-side-combinable count over a
handful of facet values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anisearch_model_spark.config import BM25Params


def facet_counts(index, query_text: str, facet_col: str = "role",
                 params: BM25Params | None = None,
                 field: str | None = None) -> DataFrame:
    """Facet histogram of the full BM25 match set.

    Returns one row per facet value: ``(facet, n_docs, top_score)``
    ordered (n_docs DESC, facet ASC) — the count of matching live docs
    carrying that value and the best score among them.  Deletes are
    honored (``score_matches`` applies the tombstone mask), so facet
    counts never resurrect a taken-down doc.
    """
    import numpy as np
    import pandas as pd

    from anisearch_model_spark.config import BM25Params as _BM25Params
    from anisearch_model_spark.query.engine import (
        IndexStore,
        _fold_bucket_scores,
        resolve_query_idf,
    )

    assert isinstance(index, IndexStore)
    params = params or _BM25Params()
    spark = index.spark
    facet_type = index.doc_map.schema[facet_col].dataType.simpleString()
    out_schema = f"facet {facet_type}, n_docs long, top_score double"
    idf = resolve_query_idf(index, query_text, field=field)
    if not idf:
        return spark.createDataFrame([], out_schema)
    _, avgdl = index.field_stats(field)
    k1, b = params.k1, params.b
    bidf = spark.sparkContext.broadcast(idf)
    tomb = index.tombstones
    btomb = spark.sparkContext.broadcast(tomb) if len(tomb) else None

    blocks = index.postings.filter(F.col("term").isin(list(idf.keys())))
    if field is not None:
        blocks = blocks.filter(F.col("field") == field)
    blocks = blocks.select("bucket", "term", "first_doc_id",
                           "doc_deltas", "tfs", "dls")
    meta = index.doc_map.select("bucket", "doc_id",
                                F.col(facet_col).alias("facet"))

    # r6 shape: postings and doc_map share the SAME doc-range bucketing,
    # so scoring AND facet attribution both happen inside one COGROUPED
    # kernel per bucket — the match set itself never crosses an exchange
    # (pre-r6: scored-output exchange + sort-merge join with the doc_map;
    # now: one blocks exchange + one doc_map exchange, both keyed by
    # bucket).  The kernel emits |facet values| partial rows per bucket;
    # counts sum and maxes max exactly across disjoint buckets.
    def facet_bucket(blocks_pdf: pd.DataFrame,
                     meta_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"facet": pd.Series(dtype=object),
                              "n_docs": pd.Series(dtype="int64"),
                              "top_score": pd.Series(dtype="float64")})
        universe, acc = _fold_bucket_scores(
            blocks_pdf, bidf.value, avgdl, k1, b,
            btomb.value if btomb is not None else None)
        if len(universe) == 0 or meta_pdf.empty:
            return empty
        mids = meta_pdf["doc_id"].to_numpy("int64")
        order = np.argsort(mids, kind="stable")
        mids_sorted = mids[order]
        pos = np.minimum(np.searchsorted(mids_sorted, universe),
                         len(mids_sorted) - 1)
        hit = mids_sorted[pos] == universe  # inner-join semantics
        if not hit.any():
            return empty
        fac = meta_pdf["facet"].to_numpy()[order][pos[hit]]
        part = pd.DataFrame({"facet": fac, "score": acc[hit]})
        agg = part.groupby("facet", dropna=False, sort=False).agg(
            n_docs=("score", "size"), top_score=("score", "max")
        ).reset_index()
        return agg[["facet", "n_docs", "top_score"]]

    partials = blocks.groupBy("bucket").cogroup(
        meta.groupBy("bucket")
    ).applyInPandas(lambda bl, me: facet_bucket(bl, me), schema=out_schema)
    return (
        partials.groupBy("facet")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.max("top_score").alias("top_score"),
        )
        .orderBy(F.desc("n_docs"), F.asc("facet"))
    )
