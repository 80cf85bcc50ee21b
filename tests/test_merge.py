"""merge_indexes (index/merge.py): merging per-source builds must be
contract-identical to one fresh build over the concatenated corpus —
same scores, same ranks, same metadata — with posting buffers carried
byte-identical (never decoded)."""

import shutil

import pytest
from pyspark.sql import functions as F

from anisearch_model_spark.datagen import gen_transcripts
from anisearch_model_spark.index.merge import merge_indexes
from anisearch_model_spark.index.store import build_index
from anisearch_model_spark.query.engine import IndexStore, search


def _prefixed(spark, n, seed, prefix):
    tr = gen_transcripts(spark, n, seed=seed)
    return tr.withColumn("conv_id", F.concat(F.lit(prefix), F.col("conv_id")))


@pytest.fixture(scope="module")
def merged_vs_fresh(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    a = _prefixed(spark, 1200, 3, "a-")
    b = _prefixed(spark, 900, 4, "b-")
    da, db = str(root / "a"), str(root / "b")
    dm, df_ = str(root / "merged"), str(root / "fresh")
    build_index(spark, a, da, num_buckets=3)
    build_index(spark, b, db, num_buckets=2)
    metrics = merge_indexes(spark, [da, db], dm)
    # fresh build over the union: "a-*" convs sort before "b-*" convs, so
    # global doc ordering matches the merge's re-based id spaces exactly
    build_index(spark, a.unionByName(b), df_, num_buckets=5)
    return da, db, dm, df_, metrics


def test_merge_is_rank_identical_to_fresh_build(spark, merged_vs_fresh):
    _, _, dm, df_, metrics = merged_vs_fresh
    assert metrics["sources"] == 2 and metrics["n_buckets"] == 5
    im, if_ = IndexStore(spark, dm), IndexStore(spark, df_)
    assert im.stats["n_docs"] == if_.stats["n_docs"]
    assert abs(im.stats["avgdl"] - if_.stats["avgdl"]) < 1e-9
    for q in ["hero battle", "magic dragon quest", "dragon"]:
        got = [(r["rank"], r["conv_id"], r["score"])
               for r in search(im, q, k=15).collect()]
        want = [(r["rank"], r["conv_id"], r["score"])
                for r in search(if_, q, k=15).collect()]
        assert got == want and got


def test_merge_carries_tombstones(spark, tmp_path):
    from anisearch_model_spark.index.tombstones import delete_docs

    a = _prefixed(spark, 600, 5, "a-")
    b = _prefixed(spark, 600, 6, "b-")
    da, db, dm = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m")
    build_index(spark, a, da, num_buckets=2)
    build_index(spark, b, db, num_buckets=2)
    ia, ib = IndexStore(spark, da), IndexStore(spark, db)
    top_a = search(ia, "hero battle", k=1, with_metadata=False).collect()[0]
    top_b = search(ib, "hero battle", k=1, with_metadata=False).collect()[0]
    delete_docs(spark, da, [int(top_a["doc_id"])])
    delete_docs(spark, db, [int(top_b["doc_id"])])
    metrics = merge_indexes(spark, [da, db], dm)
    assert metrics["tombstones_carried"] == 2
    im = IndexStore(spark, dm)
    base_b = ia.stats["n_docs"]
    dead = {int(top_a["doc_id"]), int(top_b["doc_id"]) + base_b}
    hits = {int(r["doc_id"]) for r in
            search(im, "hero battle", k=30, with_metadata=False).collect()}
    assert not (hits & dead)


def test_merge_after_purge_uses_id_spans_not_live_counts(spark, tmp_path):
    """A purged source's live count shrinks but its doc-id SPAN does not
    (ids are never renumbered) — merge offsets must use the span, or the
    next source's ids collide with the purged source's survivors."""
    from anisearch_model_spark.index.tombstones import (
        delete_docs, purge_deleted)

    a = _prefixed(spark, 600, 5, "a-")
    b = _prefixed(spark, 400, 6, "b-")
    da, db, dm = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m")
    build_index(spark, a, da, num_buckets=2)
    build_index(spark, b, db, num_buckets=2)
    ia = IndexStore(spark, da)
    span_a = ia.stats["n_docs"]
    doomed = [int(r["doc_id"]) for r in search(
        ia, "hero battle", k=20, with_metadata=False).collect()]
    delete_docs(spark, da, doomed)
    purge_deleted(spark, da)
    metrics = merge_indexes(spark, [da, db], dm)
    assert metrics["n_docs"] == span_a - len(doomed) + 400
    im = IndexStore(spark, dm)
    dm_ids = im.doc_map.select("doc_id")
    assert dm_ids.count() == dm_ids.distinct().count(), "id collision"
    # b's docs must live ABOVE a's full span, not above its live count
    min_b = (im.doc_map.filter(F.col("conv_id").startswith("b-"))
             .agg(F.min("doc_id")).collect()[0][0])
    assert min_b == span_a
    # purged ids are gone for good — b's re-based ids start at span_a,
    # so none of the doomed ids can reappear under any conv
    hits = search(im, "hero battle", k=10).collect()
    assert hits and not ({int(r["doc_id"]) for r in hits} & set(doomed))


def test_merge_refuses_contract_mismatch(spark, tmp_path):
    a = _prefixed(spark, 300, 7, "a-")
    b = _prefixed(spark, 300, 8, "b-")
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, a, da, num_buckets=1)
    build_index(spark, b, db, num_buckets=1, field_col="role")
    with pytest.raises(ValueError, match="field_col"):
        merge_indexes(spark, [da, db], str(tmp_path / "m"))
    with pytest.raises(ValueError, match="at least two"):
        merge_indexes(spark, [da], str(tmp_path / "m2"))
    shutil.rmtree(str(tmp_path / "m"), ignore_errors=True)
