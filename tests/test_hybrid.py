"""query/hybrid.py: reciprocal-rank fusion of ranked candidate lists,
and the hybrid_search composition over a real index + embeddings."""

import numpy as np
import pytest

from anisearch_model_spark.query.engine import IndexStore, search
from anisearch_model_spark.query.hybrid import hybrid_search, rrf_fuse


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "rank long, doc_id long")


def test_rrf_fuse_hand_computed(spark):
    """Two 3-deep lists with one overlap: contributions are exactly
    w/(rrf_k + rank), overlap sums both, singletons carry one term."""
    a = _ranked(spark, [(1, 10), (2, 20), (3, 30)])
    b = _ranked(spark, [(1, 20), (2, 40), (3, 50)])
    out = {r["doc_id"]: (r["rank"], r["rrf_score"])
           for r in rrf_fuse({"a": a, "b": b}, k=10, rrf_k=60).collect()}
    assert out[20][1] == pytest.approx(1 / 62 + 1 / 61, rel=0, abs=0)
    assert out[10][1] == 1 / 61
    assert out[40][1] == 1 / 62
    assert out[30][1] == 1 / 63
    assert out[50][1] == 1 / 63
    # doc 20 fused from both lists must rank first
    assert out[20][0] == 1
    # exact-tie (30 vs 50, both 1/63) breaks by doc_id ascending
    ranks = {d: r for d, (r, _s) in out.items()}
    assert ranks[30] < ranks[50]


def test_rrf_fuse_weights_and_k(spark):
    a = _ranked(spark, [(1, 1), (2, 2)])
    b = _ranked(spark, [(1, 2), (2, 3)])
    out = rrf_fuse({"a": a, "b": b}, k=2, rrf_k=10,
                   weights={"a": 2.0, "b": 0.5}).collect()
    assert len(out) == 2  # k truncates below the 3 distinct ids
    scores = {r["doc_id"]: r["rrf_score"] for r in out}
    assert scores[1] == pytest.approx(2.0 / 11, rel=0, abs=0)
    assert scores[2] == pytest.approx(2.0 / 12 + 0.5 / 11, rel=0, abs=0)


def test_rrf_fuse_single_list_preserves_order(spark):
    a = _ranked(spark, [(1, 5), (2, 3), (3, 9)])
    out = rrf_fuse({"only": a}, k=3).collect()
    assert [r["doc_id"] for r in out] == [5, 3, 9]
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_rrf_fuse_empty_raises():
    with pytest.raises(ValueError):
        rrf_fuse({})


def test_hybrid_search_end_to_end(spark, index_dir):
    """Real index + synthetic embeddings: the fused set is exactly the
    RRF of the two top-N lists, and a doc present in both lists
    outranks where either list alone would put it lower."""
    idx = IndexStore(spark, index_dir)
    q = "hero battle"
    lex = search(idx, q, k=15, with_metadata=False).collect()
    assert lex
    # embeddings: lexical top doc gets the query vector itself (cosine
    # 1.0 → dense rank 1), everything else deterministic noise
    rng = np.random.RandomState(7)
    top_doc = int(lex[0]["doc_id"])
    rows = []
    qvec = rng.randn(8)
    for i in range(3000):
        v = qvec if i == top_doc else rng.randn(8)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = hybrid_search(idx, q, emb, [float(x) for x in qvec],
                        k=5, n_candidates=15).collect()
    assert [r["rank"] for r in out] == list(range(1, 6))
    # top_doc is rank 1 in BOTH lists → rrf 2/61, unbeatable
    assert int(out[0]["doc_id"]) == top_doc
    assert out[0]["rrf_score"] == pytest.approx(2 / 61, rel=1e-12)


def test_hybrid_serve_route(spark, index_dir, tmp_path):
    import io
    import json

    from anisearch_model_spark.cli import serve_loop

    emb_path = str(tmp_path / "emb.parquet")
    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(4)]) for i in range(3000)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.parquet(emb_path)

    reqs = "\n".join([
        json.dumps({"query": "hero battle", "k": 3,
                    "hybrid": {"embeddings": emb_path, "vec_id": 0}}),
        json.dumps({"hybrid": {"embeddings": emb_path, "vec_id": 0}}),
        json.dumps({"query": "x", "hybrid": {"vec_id": 0}}),
        json.dumps({"query": "x", "hybrid": {"embeddings": emb_path,
                                             "vec_id": 0}, "mlt": 1}),
        json.dumps({"query": "x", "snippets": True,
                    "hybrid": {"embeddings": emb_path, "vec_id": 0}}),
        json.dumps({"query": "hero", "k": 2,
                    "hybrid": {"embeddings": emb_path,
                               "vec_id": 999999}}),
    ]) + "\n"
    out = io.StringIO()
    served = serve_loop(spark, index_dir, io.StringIO(reqs), out, log=False)
    lines = [json.loads(ln) for ln in out.getvalue().splitlines()]
    assert served == 6
    assert len(lines[0]["results"]) == 3
    assert {"rank", "doc_id", "rrf_score"} <= set(lines[0]["results"][0])
    assert "error" in lines[1]  # no query
    assert "error" in lines[2]  # missing embeddings key
    assert "error" in lines[3] and "mutually exclusive" in lines[3]["error"]
    assert "error" in lines[4] and "plain term" in lines[4]["error"]
    assert "error" in lines[5] and "not found" in lines[5]["error"]


def test_hybrid_search_with_ann_dense_path(spark, index_dir, tmp_path):
    """The dense side swaps for the bucketed ANN path (scale path): an
    LSH-materialized index feeds hybrid_search via dense_topk_fn, the
    anchor doc still fuses to rank 1, and the candidate scan prunes to
    bucket partitions (no full-corpus cosine)."""
    from anisearch_model_spark.operators.similarity import (
        RandomHyperplaneLSH,
    )

    idx = IndexStore(spark, index_dir)
    q = "hero battle"
    lex = search(idx, q, k=10, with_metadata=False).collect()
    top_doc = int(lex[0]["doc_id"])
    rng = np.random.RandomState(11)
    qvec = rng.randn(8)
    rows = [(i, [float(x) for x in (qvec if i == top_doc else rng.randn(8))])
            for i in range(3000)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lsh = RandomHyperplaneLSH(n_planes=6, dim=8, seed=4)
    path = str(tmp_path / "lsh_idx")
    lsh.fit(emb, path)
    out = hybrid_search(
        idx, q, None, [float(x) for x in qvec], k=5, n_candidates=10,
        dense_topk_fn=lambda v, n: lsh.query_index(spark, path, v, k=n),
    ).collect()
    assert int(out[0]["doc_id"]) == top_doc
    assert out[0]["rrf_score"] == pytest.approx(2 / 61, rel=1e-12)
