"""Hybrid lexical+dense retrieval: reciprocal-rank fusion (RRF).

The reference retrieves purely dense — SBERT embeddings scored by
cosine (``/root/reference/src/api.py:270-313``) — while this engine's
headline scorer is lexical BM25.  Production search runs BOTH and
fuses; RRF (Cormack/Clarke/Buettcher, SIGIR 2009) is the standard
score-free fusion::

    rrf(d) = Σ_lists  w_l / (rrf_k + rank_l(d))

using only each list's RANK, so incomparable score scales (unbounded
BM25 sums vs cosine in [-1, 1]) need no normalization.  Documents
missing from a list simply contribute nothing for it.

Scale shape: each input is a top-N candidate list (N ~ pages·k — tiny
relative to the corpus), so the fusion itself is a union + one
group-by over ~Σ N rows; the expensive work is PRODUCING the lists,
which stays in the specialized engines (block-max BM25, bucketed ANN).
The per-doc contribution sum folds in sorted list-name order — float64
addition is order-sensitive and a bare sum() would be
partition-order-dependent (same policy as query/engine.py's per-doc
partial fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anisearch_model_spark.query.multifield import rank_and_paginate


def rrf_fuse(
    lists: dict[str, DataFrame],
    k: int = 10,
    page: int = 1,
    rrf_k: int = 60,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse named ranked candidate lists into one (rank, id, rrf_score).

    Each input DataFrame carries (``id_col``, ``rank_col``) with ranks
    starting at 1.  ``weights`` scales a list's contribution (default
    1.0 each).  Output ranks by (rrf_score DESC, id ASC), paginated
    with the engine's limit-first pattern (no unpartitioned window).
    """
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    w = {name: float((weights or {}).get(name, 1.0)) for name in lists}
    parts = []
    for name in sorted(lists):
        df = lists[name]
        parts.append(
            df.select(
                F.col(id_col).alias("_id"),
                F.lit(name).alias("_src"),
                (F.lit(w[name])
                 / (F.lit(float(rrf_k)) + F.col(rank_col).cast("double"))
                 ).alias("_contrib"),
            )
        )
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    fused = allc.groupBy("_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("_src", "_contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_contrib"],
        ).alias("rrf_score")
    )
    return rank_and_paginate(
        fused, page=page, results_per_page=k,
        score_col="rrf_score", id_col="_id",
    ).select("rank", F.col("_id").alias(id_col), "rrf_score")


def hybrid_search(
    index,
    query_text: str,
    embeddings: DataFrame | None,
    query_vec: list[float],
    k: int = 10,
    n_candidates: int = 50,
    rrf_k: int = 60,
    lexical_weight: float = 1.0,
    dense_weight: float = 1.0,
    dense_topk_fn=None,
) -> DataFrame:
    """BM25 top-N ∪ cosine top-N → RRF top-k over a REAL index.

    The lexical list comes from the engine's default (block-max)
    scorer; the dense list from the exact cosine operator by default —
    the fusion is rank-only, so the dense side swaps freely for the
    bucketed scale paths: pass ``dense_topk_fn(query_vec, n) ->
    (rank, vec_id, ...)`` built on ``RandomHyperplaneLSH.query_index``
    or ``IVFIndex.query_index`` (operators/similarity.py) and leave
    ``embeddings`` as None.  At 100 TB the exact path scans every
    vector; the ANN paths prune to candidate-bucket partition files.
    ``embeddings`` must carry (doc_id-aligned ``vec_id``,
    ``embedding``).
    """
    from anisearch_model_spark.operators.similarity import cosine_topk
    from anisearch_model_spark.query.engine import search

    lex = search(index, query_text, k=n_candidates,
                 with_metadata=False).select("rank", "doc_id")
    if dense_topk_fn is not None:
        dense_raw = dense_topk_fn(query_vec, n_candidates)
    else:
        dense_raw = cosine_topk(embeddings, query_vec, k=n_candidates)
    dense = dense_raw.select("rank", F.col("vec_id").alias("doc_id"))
    return rrf_fuse(
        {"lexical": lex, "dense": dense}, k=k, rrf_k=rrf_k,
        weights={"lexical": lexical_weight, "dense": dense_weight},
    )
