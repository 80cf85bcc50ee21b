"""Multi-field result semantics: per-field top-k → merge → dedup-keeping-
best → rank → paginate (reference operators T1–T5, SURVEY.md §2.5).

The reference scores 10 synopsis columns per entity, takes per-column
top-k (``src/api.py:338-344``), concat-merges (``:345-349``), dedups by
title keeping the first (= best) hit (``:427-455``), and paginates
(``:462-466``).  Here the same semantics run as window functions with
EXPLICIT tie-breaks — (score DESC, doc_id/entity ASC, field ASC) — instead
of the reference's implicit stable-sort emission order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from anisearch_model_spark.config import RESULTS_PER_PAGE
from anisearch_model_spark.functions.windows import constant_partition


def per_field_topk(scored: DataFrame, k: int, field_col: str = "field",
                   score_col: str = "score", id_col: str = "doc_id") -> DataFrame:
    """T1: keep top-k rows per field (candidate generation).

    Two-phase salted top-k (r6): ``field`` is low-cardinality (a handful
    of synopsis columns / langs / return-flags), so a window partitioned
    by field alone serializes each field's FULL sort onto one task — at
    sf0.1 that is 600k lineitem rows on 3 tasks, and at any real scale
    the per-field sort is the job.  Phase 1 windows over (field, salt)
    with a deterministic salt = pmod(xxhash64(id), S) and keeps k per
    salt — the sort spreads across |fields|·S tasks; phase 2 re-windows
    the ≤ |fields|·S·k survivors exactly.  Per-(field,salt) top-k is a
    superset of per-field top-k, and the salt is a pure function of the
    id, so results are identical and run-stable (guide §2.5: never salt
    with rand())."""
    spark = scored.sparkSession
    nsalt = max(spark.sparkContext.defaultParallelism, 8)
    w1 = Window.partitionBy(field_col, "_salt").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    pre = (
        scored.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(nsalt)))
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w = Window.partitionBy(field_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        pre.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def dedup_best(cands: DataFrame, key_col: str, score_col: str = "score",
               field_col: str = "field", id_col: str = "doc_id") -> DataFrame:
    """T3: one row per key — the best-scoring field hit (ties: field asc,
    id asc; replaces reference first-seen-wins under stable sort)."""
    w = Window.partitionBy(key_col).orderBy(
        F.desc(score_col), F.asc(field_col), F.asc(id_col)
    )
    return (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def rank_and_paginate(deduped: DataFrame, page: int = 1,
                      results_per_page: int = RESULTS_PER_PAGE,
                      score_col: str = "score", id_col: str = "doc_id") -> DataFrame:
    """T4+T5: dense global rank then page slice (reference recomputes the
    full ranking per page, src/api.py:424 — we keep that contract).

    Limit-FIRST guard: ``orderBy().limit(page*rpp)`` plans
    TakeOrderedAndProject (per-partition heap + driver merge), so even an
    unbounded caller can't regress this into a full-table single-partition
    window; the rank window then runs over ≤ page*rpp rows under an
    explicit (constant) partition."""
    hi = page * results_per_page
    bounded = deduped.orderBy(F.desc(score_col), F.asc(id_col)).limit(hi)
    w = Window.partitionBy(constant_partition(id_col)).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    ranked = bounded.withColumn("rank", F.row_number().over(w).cast("long"))
    lo = (page - 1) * results_per_page
    return ranked.filter(F.col("rank") > lo)


def multifield_search(scored: DataFrame, key_col: str, k: int = 10,
                      page: int = 1, results_per_page: int = RESULTS_PER_PAGE,
                      field_col: str = "field", score_col: str = "score",
                      id_col: str = "doc_id") -> DataFrame:
    """Full T1→T5 pipeline over pre-scored (id, key, field, score) rows."""
    cand_k = max(k, page * results_per_page)
    cands = per_field_topk(scored, cand_k, field_col, score_col, id_col)
    best = dedup_best(cands, key_col, score_col, field_col, id_col)
    return rank_and_paginate(best, page, results_per_page, score_col, id_col)


def search_fields(index, query_text: str, fields: list[str], k: int = 10,
                  page: int = 1, pruned: bool = True) -> DataFrame:
    """The reference's multi-COLUMN search, end-to-end with real scoring
    (src/api.py:316-349: encode once → score each column's own matrix →
    per-column top-k → merge → dedup by entity keeping best → paginate):

      * each field is scored against ITS OWN sub-corpus (per-field
        df/n_docs/avgdl from the field-qualified index; the postings scan
        partition-prunes to that field),
      * per-field top-k via TakeOrderedAndProject (T1),
      * union merge (T2), conv-level dedup keeping the best field hit
        with the explicit (score DESC, field ASC, doc_id ASC) tie-break
        (T3), limit-first rank + page slice (T4+T5).

    Returns (rank, conv_id, doc_id, field, score).
    """
    from functools import reduce

    from anisearch_model_spark.query.engine import (
        IndexStore, probe_doc_map, topk_bmw, topk_exhaustive)

    assert isinstance(index, IndexStore) and fields
    fn = topk_bmw if pruned else topk_exhaustive
    # ADAPTIVE over-fetch: start at 5× the page need and DOUBLE until the
    # page holds page·k distinct conv_ids or every field's candidates are
    # exhausted — a fixed multiplier under-fills the page whenever a few
    # hot conversations own more than 5·page·k of the top turns.  Each
    # round's candidates are already collected (probe_doc_map), so the
    # fill check is a driver-side set-size, not an extra Spark job.
    need = page * k
    cand_k = need * 5
    for _ in range(32):  # corpus exhaustion terminates long before this
        per_field = [
            fn(index, query_text, cand_k, field=f).select(
                F.lit(f).alias("field"), "doc_id", "score"
            )
            for f in fields
        ]
        all_cands = reduce(lambda a, b: a.unionByName(b), per_field)
        # collect the |fields|·cand_k candidates, prune the doc_map probe
        # to their bucket partitions (never a full doc_map scan per query)
        local, meta = probe_doc_map(index, all_cands, ["doc_id", "conv_id"])
        joined = local.join(F.broadcast(meta), "doc_id")
        rows = joined.collect()
        fetched_per_field: dict[str, int] = {}
        for r in rows:
            fetched_per_field[r["field"]] = fetched_per_field.get(r["field"], 0) + 1
        n_convs = len({r["conv_id"] for r in rows})
        if n_convs >= need or all(
            fetched_per_field.get(f, 0) < cand_k for f in fields
        ):
            break
        cand_k *= 2
    spark = index.spark
    cands = (spark.createDataFrame(rows, joined.schema) if rows
             else spark.createDataFrame([], joined.schema))
    best = dedup_best(cands, "conv_id", score_col="score", field_col="field",
                      id_col="doc_id")
    return rank_and_paginate(best, page, k, "score", "doc_id").select(
        "rank", "conv_id", "doc_id", "field", "score"
    )


def search_conversations(index, query_text: str, k: int = 10, page: int = 1,
                         pruned: bool = True) -> DataFrame:
    """Conversation-level search: score turns with BM25, dedup by conv_id
    keeping the best turn (role = the reference's 'source_column'), rank,
    paginate.  The transcript-native analog of the reference's per-title
    dedup (src/api.py:427-455)."""
    from anisearch_model_spark.query.engine import (
        IndexStore, probe_doc_map, topk_bmw, topk_exhaustive)

    assert isinstance(index, IndexStore)
    # ADAPTIVE over-fetch before conv-dedup: start at 5× the page need
    # and DOUBLE until the page holds page·k distinct conv_ids or the
    # candidates are exhausted (the scorer returned fewer turns than
    # asked) — a fixed pool under-fills the page whenever hot
    # conversations own more than 5·page·k of the top turns.  The fill
    # check reuses the already-collected probe rows (driver-side set
    # size), not an extra Spark job.
    need = page * k
    cand_k = need * 5
    fn = topk_bmw if pruned else topk_exhaustive
    for _ in range(32):  # corpus exhaustion terminates long before this
        top_turns = fn(index, query_text, cand_k)
        # blank-turn skip BEFORE dedup (reference src/api.py:427-455 drops
        # blank-synopsis rows before title dedup).  BM25 can't surface a
        # zero-token doc today, but the guard keeps the dedup contract
        # honest for any scorer variant that could (metadata boosts,
        # embeddings).  The probe prunes the doc_map scan to the
        # candidates' buckets + ids.
        local, meta = probe_doc_map(
            index, top_turns, ["doc_id", "conv_id", "turn_idx", "role"],
            meta_filter=F.length(F.trim(F.coalesce(F.col("text"), F.lit("")))) > 0,
        )
        n_fetched = local.count()  # local candidate frame — no cluster scan
        joined = local.join(F.broadcast(meta), "doc_id")
        rows = joined.collect()
        if len({r["conv_id"] for r in rows}) >= need or n_fetched < cand_k:
            break
        cand_k *= 2
    spark = index.spark
    cands = (spark.createDataFrame(rows, joined.schema) if rows
             else spark.createDataFrame([], joined.schema))
    best = dedup_best(cands, "conv_id", score_col="score", field_col="role",
                      id_col="doc_id")
    return rank_and_paginate(best.drop("rank"), page, k, "score", "doc_id").select(
        "rank", "conv_id", "doc_id", "turn_idx", "role", "score"
    )


def fuse_weighted(cands: DataFrame, key_col: str, weights: dict[str, float],
                  score_col: str = "score", field_col: str = "field",
                  id_col: str = "doc_id") -> DataFrame:
    """Weighted CombSUM rank fusion (the BM25F-flavored generalization of
    T3): one row per key with ``fused_score = Σ_f w_f · best_f(key)``,
    where ``best_f`` is the key's best per-field score.

    ``dedup_best`` keeps the single best field hit (the reference's
    first-seen-wins dedup, src/api.py:427-455); fusion instead rewards
    entities that match in SEVERAL fields — the standard multi-field
    relevance model (BM25F / CombSUM) that a max-only dedup cannot
    express.  Fields absent from ``weights`` are dropped.  The
    representative ``(doc_id, field)`` carried on each fused row is the
    largest weighted contribution, tie-broken (field ASC, id ASC).

    Shape: two windows over the candidate relation partitioned by
    (key, field) then key — both partial-aggregable, no driver
    materialization; output is |keys| rows.
    """
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    w_kf = Window.partitionBy(key_col, field_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    best = (
        cands.withColumn("_w", wmap[F.col(field_col)])
        .filter(F.col("_w").isNotNull())
        .withColumn("_rn", F.row_number().over(w_kf))
        .filter(F.col("_rn") == 1)
        .withColumn("wscore", F.col("_w") * F.col(score_col))
    )
    # fused sum folds in ASCENDING FIELD order (sorted-array aggregate),
    # never a bare sum(): float64 addition is order-sensitive, and an
    # unordered window sum is partition-order-dependent — the same value
    # would then differ between runs (same fix as the engine's per-doc
    # partial fold, query/engine.py::score_matches).  Full precision out;
    # callers that compare against a rounding oracle round themselves.
    fused = best.groupBy(key_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(field_col, "wscore"))),
            F.lit(0.0),
            lambda acc, x: acc + x["wscore"],
        ).alias("fused_score")
    )
    w_key = Window.partitionBy(key_col).orderBy(
        F.desc("wscore"), F.asc(field_col), F.asc(id_col)
    )
    rep = (
        best.withColumn("_rep", F.row_number().over(w_key))
        .filter(F.col("_rep") == 1)
        .select(key_col, id_col, field_col)
    )
    return rep.join(fused, key_col).select(
        key_col, id_col, field_col, "fused_score"
    )


def search_fields_fused(index, query_text: str, weights: dict[str, float],
                        k: int = 10, page: int = 1) -> DataFrame:
    """Multi-field search under weighted CombSUM fusion: score each
    weighted field's FULL match set against its own sub-corpus, fuse per
    conversation with ``fuse_weighted``, rank, paginate.

    Exact by construction: fusion sums across fields, so an entity just
    below every per-field top-k can still win the fused ranking —
    candidate generation therefore takes the complete per-field match
    sets (``score_matches``; cost = query-term posting volume per field,
    each scan partition-pruned to its field), not truncated pools.  The
    conv_id resolution is a doc_id equi-join against the doc_map
    (co-bucketed by doc range with the postings, same note as
    query/facets.py), and the final ranking is limit-first
    (TakeOrderedAndProject) via ``rank_and_paginate``.

    Returns (rank, conv_id, doc_id, field, fused_score).
    """
    from functools import reduce

    from anisearch_model_spark.query.engine import IndexStore, score_matches

    assert isinstance(index, IndexStore) and weights
    per_field = [
        score_matches(index, query_text, field=f).select(
            F.lit(f).alias("field"), "doc_id", "score"
        )
        for f in sorted(weights)
    ]
    all_matches = reduce(lambda a, b: a.unionByName(b), per_field)
    meta = index.doc_map.select("doc_id", "conv_id")
    cands = all_matches.join(meta, "doc_id")
    fused = fuse_weighted(cands, "conv_id", weights)
    return rank_and_paginate(
        fused, page, k, "fused_score", "doc_id"
    ).select("rank", "conv_id", "doc_id", "field", "fused_score")
