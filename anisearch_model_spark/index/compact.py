"""Index compaction for long-lived incremental indexes.

Every streaming ``append_batch`` lands its docs in NEW buckets
(streaming/incremental.py) — after thousands of micro-batches the index
holds thousands of tiny bucket partitions: per-bucket ``applyInPandas``
groups shrink, task-scheduling overhead dominates, and the block-max
per-bucket top-k merge widens.  The reference never faces this (it
rebuilds from scratch per run, ``/root/reference/src/sbert.py:336-356``);
a streaming deployment hits it first.

Compaction is CHEAP by the build's own invariant: buckets are disjoint
sorted doc-id ranges (index/build.py docstring — a term's global posting
list is the bucket-ascending concatenation of its per-bucket blocks), so
merging adjacent buckets is pure concatenation — no re-tokenize, no
re-encode, no posting shuffle beyond moving the merged partitions.  Only
the ``bucket`` label and the per-(term, field) ``block_id`` numbering
change; queries return byte-identical results because neither scorer
depends on bucket boundaries (exhaustive ignores them; block-max does a
per-bucket top-k then a global merge, which is bucket-partition-
independent for a total order).

Plan: greedily group ADJACENT (doc-range-ascending) buckets until each
group holds ≥ ``target_docs``; single-bucket groups are left untouched
(zero I/O for already-full buckets — steady state rewrites only the tail
of small append buckets).  On an Iceberg deployment this whole job is
``rewrite_data_files``; the Parquet fallback writes merged partitions to
a temp dir and swaps directories.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from anisearch_model_spark.config import BM25Params


def plan_groups(buckets: dict[str, list[int]], target_docs: int) -> list[list[int]]:
    """Group bucket ids (adjacent in doc-range order) so every group holds
    ≥ target_docs where possible.  Pure function — unit-testable."""
    order = sorted(buckets, key=lambda b: buckets[b][0])
    groups: list[list[int]] = []
    cur: list[int] = []
    cur_docs = 0
    for b in order:
        cur.append(int(b))
        cur_docs += int(buckets[b][1])
        if cur_docs >= target_docs:
            groups.append(cur)
            cur, cur_docs = [], 0
    if cur:
        # the undersized tail becomes its OWN group: its buckets still
        # merge into one (slivers removed) without rewriting the adjacent
        # full bucket; repeated append→compact cycles converge to at most
        # one undersized bucket at the end of the range
        groups.append(cur)
    return groups


def _stage_partitions(spark, df, partition_by: list[str], tmp_dir: str) -> None:
    """Phase 1 of a swap: write ``df`` partitioned into ``tmp_dir``.
    Originals are untouched — a crash here loses nothing."""
    shutil.rmtree(tmp_dir, ignore_errors=True)
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp_dir)


def _swap_in(table_dir: str, old_buckets: list[int], tmp_dir: str) -> None:
    """Phase 2: rename the old bucket dirs ASIDE (bucket=N.old), then move
    the staged dirs in.  The last copy of a bucket is never destroyed
    before the manifest commits — the ``.old`` dirs are only dropped by
    ``_drop_aside`` AFTER the manifest (the commit point) is durably
    written; until then ``recover_compaction`` can roll back."""
    for b in old_buckets:
        src = os.path.join(table_dir, f"bucket={b}")
        if os.path.isdir(src):
            os.rename(src, src + ".old")
    for entry in os.listdir(tmp_dir):
        if entry.startswith("bucket="):
            dst = os.path.join(table_dir, entry)
            shutil.rmtree(dst, ignore_errors=True)  # retry leftover
            os.rename(os.path.join(tmp_dir, entry), dst)
    shutil.rmtree(tmp_dir, ignore_errors=True)


def _drop_aside(table_dir: str, old_buckets: list[int]) -> None:
    """Phase 3 (post-commit): delete the renamed-aside originals."""
    for b in old_buckets:
        shutil.rmtree(os.path.join(table_dir, f"bucket={b}.old"),
                      ignore_errors=True)


def _write_manifest(index_dir: str, manifest: dict) -> None:
    """Atomic manifest replace (tmp + rename): readers never see a torn
    file, and the rename IS the compaction commit point."""
    path = os.path.join(index_dir, "manifest.json")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, path)


def recover_compaction(index_dir: str) -> str | None:
    """Roll an interrupted compaction forward or back using the manifest
    as the authority.  Returns "rolled_back", "rolled_forward", or None.

    ``bucket=N.old`` dirs exist only inside one group's swap window (they
    are dropped right after each group's manifest commit), so the set on
    disk belongs to a single group:

    * every ``.old`` id still listed in the manifest → the crash happened
      BEFORE the commit: restore the originals, discard staged output
    * any ``.old`` id absent from the manifest → the crash happened AFTER
      the commit (the merged bucket is live): finish the cleanup
    """
    mpath = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(mpath):
        return None
    with open(mpath, encoding="utf-8") as f:
        manifest = json.load(f)
    live = set(manifest.get("buckets", {}))
    outcome = None
    for table in ("postings", "doc_map"):
        table_dir = os.path.join(index_dir, table)
        if not os.path.isdir(table_dir):
            continue
        olds = [e for e in os.listdir(table_dir)
                if e.startswith("bucket=") and e.endswith(".old")]
        ids = [e[len("bucket="):-len(".old")] for e in olds]
        if not ids:
            continue
        if all(i in live for i in ids):  # pre-commit → roll back
            for i in ids:
                dst = os.path.join(table_dir, f"bucket={i}")
                shutil.rmtree(dst, ignore_errors=True)  # staged partial
                os.rename(dst + ".old", dst)
            outcome = outcome or "rolled_back"
        else:  # post-commit → roll forward
            for i in ids:
                shutil.rmtree(os.path.join(table_dir, f"bucket={i}.old"),
                              ignore_errors=True)
            outcome = "rolled_forward"
    # tmp dirs are only ever a REDUNDANT copy once the .old state above is
    # resolved, so they are safe to clear now (never before)
    for t in ("_compact_tmp_postings", "_compact_tmp_docmap"):
        shutil.rmtree(os.path.join(index_dir, t), ignore_errors=True)
    return outcome


def compact_index(spark: SparkSession, index_dir: str,
                  target_docs: int | None = None,
                  params: BM25Params | None = None) -> dict:
    """Merge small adjacent buckets so the index holds full-size buckets.

    ``target_docs``: minimum docs per merged bucket (default: the mean
    bucket size a fresh ``build_index`` of the current corpus would pick,
    n_docs / num_buckets of the base build, floored at 1).
    Returns {buckets_before, buckets_after, groups_rewritten}.
    """
    from anisearch_model_spark.index.build import POSTINGS_SCHEMA
    from anisearch_model_spark.index.docmap import BUCKETED_SCHEMA
    from anisearch_model_spark.index.store import finalize_metadata

    params = params or BM25Params()
    healed = recover_compaction(index_dir)  # heal an interrupted prior run
    # physically drop tombstoned docs first: merged buckets then never
    # carry dead postings forward (tombstones.py owns the rewrite)
    from anisearch_model_spark.index.tombstones import purge_deleted

    purge = purge_deleted(spark, index_dir, params=params)
    with open(os.path.join(index_dir, "manifest.json"), encoding="utf-8") as f:
        manifest = json.load(f)
    with open(os.path.join(index_dir, "stats.json"), encoding="utf-8") as f:
        stats = json.load(f)
    buckets = manifest["buckets"]
    # manifest counts are doc-id SPAN widths (a purge removes docs without
    # renumbering ids) — live doc count comes from stats, which
    # purge_deleted keeps current
    n_docs = int(stats["n_docs"])
    span_total = sum(int(c) for _o, c in buckets.values())
    if target_docs is None:
        # the BASE build's bucket count (manifest — appends never touch it;
        # stats.num_buckets tracks the current fragmented count and would
        # make the target shrink as fragmentation grows)
        base_buckets = int(manifest.get("num_buckets") or stats.get("num_buckets", 32))
        target_docs = max(span_total // max(base_buckets, 1), 1)

    groups = plan_groups(buckets, int(target_docs))
    rewrite = [g for g in groups if len(g) > 1]
    before = len(buckets)

    for group in rewrite:
        new_id = min(group)
        span_lo = min(int(buckets[str(b)][0]) for b in group)
        span_n = sum(int(buckets[str(b)][1]) for b in group)

        postings = (
            spark.read.schema(POSTINGS_SCHEMA)
            .parquet(os.path.join(index_dir, "postings"))
            .filter(F.col("bucket").isin(group))
        )
        # concatenation in doc order: renumber block_id per (term, field)
        # by first_doc_id (blocks are disjoint sorted ranges — no decode)
        w = Window.partitionBy("term", "field").orderBy("first_doc_id")
        merged = (
            postings.withColumn("block_id",
                                (F.row_number().over(w) - 1).cast("int"))
            .withColumn("bucket", F.lit(int(new_id)).cast("int"))
        )
        doc_map = (
            spark.read.schema(BUCKETED_SCHEMA)
            .parquet(os.path.join(index_dir, "doc_map"))
            .filter(F.col("bucket").isin(group))
            .withColumn("bucket", F.lit(int(new_id)).cast("int"))
        )
        tmp_p = os.path.join(index_dir, "_compact_tmp_postings")
        tmp_d = os.path.join(index_dir, "_compact_tmp_docmap")
        # phase 1: stage BOTH tables while the originals stay live —
        # the reads above must finish before any original moves
        _stage_partitions(spark, merged, ["bucket", "field"], tmp_p)
        _stage_partitions(spark, doc_map, ["bucket"], tmp_d)
        # phase 2: rename originals aside, move staged dirs in
        _swap_in(os.path.join(index_dir, "postings"), group, tmp_p)
        _swap_in(os.path.join(index_dir, "doc_map"), group, tmp_d)
        # phase 3: COMMIT — the manifest rename makes this group's merge
        # durable; a crash before this line rolls back from the .old
        # dirs, a crash after it rolls forward (recover_compaction)
        for b in group:
            del buckets[str(b)]
        buckets[str(new_id)] = [span_lo, span_n]
        manifest["buckets"] = buckets
        _write_manifest(index_dir, manifest)
        # phase 4: drop the renamed-aside originals
        _drop_aside(os.path.join(index_dir, "postings"), group)
        _drop_aside(os.path.join(index_dir, "doc_map"), group)

    if rewrite:
        # mark merged buckets done so a later resumable build skips them
        from anisearch_model_spark.index.store import CHECKPOINT_SCHEMA

        rows = [(int(min(g)), "done", 0, 0, 0, 1.0, "compaction", time.time())
                for g in rewrite]
        spark.createDataFrame(rows, CHECKPOINT_SCHEMA).write.mode(
            "append").parquet(os.path.join(index_dir, "checkpoints"))
    if rewrite or healed == "rolled_forward":
        # rolled_forward: a prior run committed its manifest but died
        # before finalize — re-derive stats/dictionary now even if this
        # run itself found nothing left to rewrite
        finalize_metadata(
            spark, index_dir, n_docs, params, num_buckets=len(buckets),
            field_col=stats.get("field_col"), codec=stats.get("codec", "varint"),
        )
    return {
        "buckets_before": before,
        "buckets_after": len(buckets),
        "groups_rewritten": len(rewrite),
        "purged_docs": purge["purged_docs"],
    }
