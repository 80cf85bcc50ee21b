"""search_synonyms (query/synonyms.py): blended-term (Lucene
SynonymQuery) semantics — singleton groups must reduce to plain BM25
exactly, variants must share one idf, and the serve route must admit and
reject correctly."""

import json
import shutil

import pytest

from anisearch_model_spark.index.store import build_index
from anisearch_model_spark.query.engine import IndexStore, topk_exhaustive
from anisearch_model_spark.query.synonyms import search_synonyms


def test_singleton_groups_reduce_to_plain_bm25(spark, index_dir):
    """With no synonym map every group is a singleton: tf_g = tf and
    df_g = df, so ranks AND scores must equal the exhaustive scorer —
    ranks/ids exactly, scores to within a few ulps (the synonym path
    computes idf with the JVM's log1p, the exhaustive kernel with C's;
    measured gap ≤ 3 ulps, everything else is identical float64 ops)."""
    idx = IndexStore(spark, index_dir)
    q = "hero battle magic"
    plain = topk_exhaustive(idx, q, k=20).collect()
    blended = search_synonyms(idx, q, {}, k=20).collect()
    assert [(r["rank"], r["doc_id"]) for r in blended] == [
        (r["rank"], r["doc_id"]) for r in plain]
    for b, p in zip(blended, plain):
        assert b["score"] == pytest.approx(p["score"], rel=1e-12, abs=0.0)


def test_variants_share_group_idf(spark, tmp_path):
    """Two docs, identical shape, one uses the common variant and one the
    rare variant: under naive per-term expansion the rare-variant doc
    outranks on its higher idf; under blended scoring both docs carry the
    group idf and score IDENTICALLY."""
    d = str(tmp_path / "syn_idx")
    shutil.rmtree(d, ignore_errors=True)
    rows = (
        [(f"conv-{i:04d}", 0, "doc", "hero walks alone tonight", None, None)
         for i in range(8)]
        + [("conv-9000", 0, "doc", "protagonist walks alone tonight",
            None, None)]
    )
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    build_index(spark, tr, d, num_buckets=2)
    idx = IndexStore(spark, d)
    out = search_synonyms(idx, "hero", {"hero": ["protagonist"]},
                          k=20).collect()
    assert len(out) == 9  # union match set: both variants
    assert len({r["score"] for r in out}) == 1, (
        "identical docs must score identically regardless of variant")


def test_co_occurring_variants_blend_tf(spark, tmp_path):
    """A doc containing BOTH variants scores with tf_g = 2 saturated
    once — strictly more than a single-variant doc of the same length,
    strictly less than 2x (saturation)."""
    d = str(tmp_path / "syn_idx2")
    rows = [
        ("conv-0001", 0, "doc", "hero protagonist rises slowly", None, None),
        ("conv-0002", 0, "doc", "hero walks alone here now", None, None),
        ("conv-0003", 0, "doc", "quiet empty filler words here", None, None),
    ]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    build_index(spark, tr, d, num_buckets=1)
    idx = IndexStore(spark, d)
    out = {r["doc_id"]: r["score"] for r in search_synonyms(
        idx, "hero", {"hero": ["protagonist"]}, k=10).collect()}
    assert len(out) == 2
    both, single = max(out.values()), min(out.values())
    assert single < both < 2 * single


def test_singleton_reduction_holds_under_tombstones(spark, index_dir,
                                                    tmp_path):
    """Corpus stats don't shift until purge: with deletes pending, the
    blended df must keep counting dead docs (like the dictionary df), so
    singleton groups STILL score identically to the exhaustive scorer."""
    import shutil

    from anisearch_model_spark.index.tombstones import delete_docs

    d = str(tmp_path / "idx_syn_tomb")
    shutil.copytree(index_dir, d)
    idx = IndexStore(spark, d)
    pre = topk_exhaustive(idx, "hero battle", k=3).collect()
    delete_docs(spark, d, [int(r["doc_id"]) for r in pre[:2]])
    plain = topk_exhaustive(idx, "hero battle", k=10).collect()
    blended = search_synonyms(idx, "hero battle", {}, k=10).collect()
    assert plain and [(r["rank"], r["doc_id"]) for r in blended] == [
        (r["rank"], r["doc_id"]) for r in plain]
    for bl, p in zip(blended, plain):
        assert bl["score"] == pytest.approx(p["score"], rel=1e-12, abs=0.0)
    dead = {int(r["doc_id"]) for r in pre[:2]}
    assert not ({int(r["doc_id"]) for r in blended} & dead)


def test_synonyms_serve_route(spark, index_dir):
    import io

    from anisearch_model_spark.cli import serve_loop

    reqs = "\n".join([
        json.dumps({"query": "hero battle", "k": 3,
                    "synonyms": {"hero": ["magic"]}}),
        json.dumps({"query": "hero", "synonyms": "hero:magic|battle"}),
        json.dumps({"synonyms": {"hero": ["magic"]}}),  # no query
        json.dumps({"query": "x", "synonyms": {}, "mlt": 1}),  # exclusive
        # a lone string variant must WRAP, never iterate per character
        json.dumps({"query": "hero", "k": 2,
                    "synonyms": {"hero": "magic"}}),
        # shorthand entry without ':' → admission error, loop survives
        json.dumps({"query": "hero", "synonyms": "hero"}),
        json.dumps({"query": "hero", "bm25f_fields": "user"}),
    ]) + "\n"
    out = io.StringIO()
    served = serve_loop(spark, index_dir, io.StringIO(reqs), out, log=False)
    lines = [json.loads(ln) for ln in out.getvalue().splitlines()]
    assert served == 7
    assert len(lines[0]["results"]) == 3
    assert lines[1]["results"]
    assert "error" in lines[2]  # no query key → admission error
    assert "error" in lines[3] and "mutually exclusive" in lines[3]["error"]
    assert lines[4]["results"]
    wrapped = {r["doc_id"]: r["score"] for r in lines[4]["results"]}
    listed = {r["doc_id"]: r["score"] for r in lines[0]["results"][:2]}
    assert all(wrapped[d] == listed[d] for d in wrapped if d in listed)
    assert "error" in lines[5] and "term:variant" in lines[5]["error"]
    assert "error" in lines[6] and "field:weight" in lines[6]["error"]
