"""explain_score (query/explain.py): the per-(query, doc) BM25 breakdown
must reproduce the scorer's number exactly and stay a bounded driver-side
operation (one doubly-pruned postings scan, no ranking job)."""

import json

import pytest

from anisearch_model_spark.query.engine import IndexStore, search
from anisearch_model_spark.query.explain import explain_score


def test_explain_total_matches_search_score(spark, index_dir):
    idx = IndexStore(spark, index_dir)
    q = "hero battle magic"
    rows = search(idx, q, k=5, with_metadata=False).collect()
    assert rows
    for r in rows:
        ex = explain_score(idx, q, r["doc_id"])
        assert ex["score"] == r["score"]  # bit-identical float64 fold
        assert ex["terms"], "a ranked hit must match at least one term"
        assert abs(sum(t["pscore"] for t in ex["terms"]) - ex["score"]) < 1e-3
        for t in ex["terms"]:
            assert t["tf"] >= 1 and t["dl"] >= 1 and t["pscore"] > 0


def test_explain_unknown_doc_and_no_match(spark, index_dir):
    idx = IndexStore(spark, index_dir)
    with pytest.raises(ValueError, match="unknown document"):
        explain_score(idx, "hero", 10**12)
    ex = explain_score(idx, "zzzznothere", 0)
    assert ex["score"] == 0.0 and ex["terms"] == []


def test_explain_flags_tombstoned_doc(spark, index_dir, tmp_path):
    import shutil

    from anisearch_model_spark.index.tombstones import delete_docs

    d = str(tmp_path / "idx_explain_tomb")
    shutil.copytree(index_dir, d)
    idx = IndexStore(spark, d)
    top = search(idx, "hero battle", k=1, with_metadata=False).collect()[0]
    delete_docs(spark, d, [int(top["doc_id"])])
    ex = explain_score(idx, "hero battle", int(top["doc_id"]))
    # the breakdown still shows WHY it scored; the flag shows why it no
    # longer appears in results
    assert ex["tombstoned"] is True and ex["score"] == top["score"]


def test_explain_serve_route(spark, index_dir):
    import io

    from anisearch_model_spark.cli import serve_loop

    top = search(IndexStore(spark, index_dir), "hero battle",
                 k=1, with_metadata=False).collect()[0]
    reqs = "\n".join([
        json.dumps({"query": "hero battle", "explain": int(top["doc_id"])}),
        json.dumps({"explain": 5}),  # missing query → admission error
        json.dumps({"query": "x", "explain": 1, "mlt": 2}),  # exclusive
    ]) + "\n"
    out = io.StringIO()
    served = serve_loop(spark, index_dir, io.StringIO(reqs), out, log=False)
    lines = [json.loads(ln) for ln in out.getvalue().splitlines()]
    assert served == 3
    assert lines[0]["results"][0]["score"] == top["score"]
    assert "error" in lines[1]  # no query key → admission error
    assert "error" in lines[2] and "mutually exclusive" in lines[2]["error"]
