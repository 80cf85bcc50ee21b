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
    from anisearch_model_spark.query.engine import IndexStore, score_matches

    assert isinstance(index, IndexStore)
    scored = score_matches(index, query_text, params, field=field)
    meta = index.doc_map.select(F.col("doc_id"),
                                F.col(facet_col).alias("facet"))
    return (
        scored.join(meta, "doc_id")
        .groupBy("facet")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("score").alias("top_score"),
        )
        .orderBy(F.desc("n_docs"), F.asc("facet"))
    )
