"""Composed corpus-prep pipeline — the reference's headline ETL as ONE
declarative plan (``src/merge_datasets.py:353-689``: load → project →
filter → dedup → chained full-outer joins → title consolidation →
first-match lookup → normalize → any-nonempty), built from the unit
operators in ``operators/etl.py`` so Catalyst sees a single tree and can
push filters/pruning through every stage.

Scale shape: every outer join is 1:1 (sources are key-deduped first), so
the fold is |sources|-1 shuffles on one shared key with no fan-out; the
lookup join broadcasts the small side; all normalization is columnar
expressions inside whole-stage codegen.  The reference runs the same
pipeline as a sequence of in-memory pandas mutations plus an O(rows×keys)
nested-loop lookup (``merge_datasets.py:223-320``).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame

from anisearch_model_spark.operators.etl import (
    any_nonempty_filter,
    blank_numbered_lists,
    blank_phrases,
    coalesce_priority,
    dedup_across_columns,
    dedup_by_key,
    first_match_lookup,
)


def prepare_corpus(
    sources: Sequence[DataFrame],
    key: str,
    title_cols: Sequence[str] = (),
    text_cols: Sequence[str] = (),
    banned_phrases: Sequence[str] = (),
    numbered_list_cols: Sequence[str] = (),
    lookup: DataFrame | None = None,
    lookup_base_keys: Sequence[str] = (),
    lookup_keys: Sequence[str] = (),
    lookup_value: str | None = None,
    lookup_out: str = "extra_info",
    title_out: str = "title",
    dedup_sources: bool = True,
) -> DataFrame:
    """Merge N canonical-schema sources into one prepared corpus.

    ``sources`` are already projected/renamed to the canonical schema
    (P1/P2 happen at the caller, mirroring the reference's per-CSV
    ``usecols``/``rename`` at load).  Steps, in the reference's order:

      1. A1  per-source key dedup (deterministic: ordered by the source's
             non-key columns) so every join in step 2 is 1:1;
      2. J1/J2  left-fold of full-outer equi-joins on ``key``
             (merge_datasets.py:518-572 — four chained outer merges);
      3. F12/F13  unwanted-phrase + numbered-list blanking on text cols
             (clean_synopsis / remove_numbered_list_synopsis);
      4. F14  priority title coalesce → ``title_out``
             (consolidate_titles, :141-180);
      5. J4  first-match lookup join for supplemental info
             (add_additional_info, :223-320 — broadcast joins + ordered
             coalesce instead of the reference's per-row probe);
      6. A2  row-wise cross-column dedup of the text cols
             (remove_duplicate_infos, :324-349);
      7. P7  keep rows with ≥1 non-blank text col (:654-658).
    """
    assert sources, "prepare_corpus needs at least one source"
    if dedup_sources:
        sources = [
            dedup_by_key(s, [key], [c for c in s.columns if c != key] or [key])
            for s in sources
        ]
    merged = reduce(lambda a, b: a.join(b, key, "outer"), sources)
    if banned_phrases:
        for c in text_cols:
            merged = blank_phrases(merged, c, list(banned_phrases))
    for c in numbered_list_cols:
        merged = blank_numbered_lists(merged, c)
    if title_cols:
        merged = coalesce_priority(merged, title_out, list(title_cols))
    if lookup is not None:
        assert lookup_base_keys and lookup_keys and lookup_value
        merged = first_match_lookup(
            merged, lookup, list(lookup_base_keys), list(lookup_keys),
            lookup_value, lookup_out,
        )
    if len(text_cols) > 1:
        merged = dedup_across_columns(merged, list(text_cols))
    if text_cols:
        merged = any_nonempty_filter(merged, list(text_cols))
    return merged


def rollup_conversations(tr, sep: str = " "):
    """Roll multi-turn transcripts up to ONE document per conversation —
    the coarse-granularity rollup that lets the same index machinery
    serve entity-level search (document = conversation, text = turns
    concatenated in turn order).

    BM25 over the rollup is exactly BM25 over per-conversation summed
    term frequencies and summed doc lengths (term positions don't enter
    the score), so this one pre-aggregation turns the turn-level engine
    into a conversation-level engine with no scorer changes; build the
    result with ``build_index`` and query it with any scorer.  The
    reference's entity rows (one anime, 10 synopsis columns,
    src/api.py:316-349) are this shape natively — transcripts need the
    rollup.

    Shape: one shuffle on conv_id; the concat is a partial-merge
    objectHashAggregate (collect_list merges map-side), and the sort is
    per-conversation over that conversation's own turns (array_sort of
    (turn_idx, text) structs — no global sort).  Role/tool survive as
    arrays of the distinct values seen, ts as the conversation's first
    timestamp.
    """
    from pyspark.sql import functions as F

    return (
        tr.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("turn_idx", "text"))
            ).alias("_turns"),
            F.array_sort(F.array_distinct(
                F.collect_list("role"))).alias("roles"),
            F.array_sort(F.array_distinct(
                F.collect_list("tool"))).alias("tools"),
            F.min("ts").alias("ts"),
            F.count("*").alias("n_turns"),
        )
        .select(
            "conv_id",
            F.lit(0).alias("turn_idx"),
            F.lit("conv").alias("role"),
            F.array_join(
                F.transform("_turns", lambda t: t["text"]), sep
            ).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            "ts",
            "roles",
            "tools",
            "n_turns",
        )
    )
