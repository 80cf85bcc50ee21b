"""Round-5 search-surface additions, each proved against the single-node
oracle (the same parity discipline as the ranked paths):

  * facet_counts — facet histogram over the FULL match set;
  * fuse_weighted / search_fields_fused — weighted CombSUM fusion
    (BM25F-flavored multi-field relevance, vs dedup_best's max-only);
  * more_like_this — tf·idf term extraction → BM25 similarity query.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anisearch_model_spark.query.engine import IndexStore, topk_exhaustive
from anisearch_model_spark.query.facets import facet_counts
from anisearch_model_spark.query.mlt import mlt_terms, more_like_this
from anisearch_model_spark.query.multifield import (
    fuse_weighted,
    search_fields_fused,
)
from anisearch_model_spark.query.oracle import OracleIndex

Q = "hero battle magic world"


@pytest.fixture(scope="module")
def index(spark, index_dir):
    return IndexStore(spark, index_dir)


@pytest.fixture(scope="module")
def doc_meta(index):
    return (
        index.doc_map.select("doc_id", "conv_id", "role", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def oracle(doc_meta):
    return OracleIndex(doc_meta[["doc_id", "text"]])


# ---------------------------------------------------------------- facets

def test_facet_counts_match_oracle_full_match_set(index, oracle, doc_meta):
    got = facet_counts(index, Q, facet_col="role").toPandas()
    scored = oracle.score(Q).merge(
        doc_meta[["doc_id", "role"]], on="doc_id"
    )
    expect = (
        scored.groupby("role")
        .agg(n_docs=("doc_id", "size"), top_score=("score", "max"))
        .reset_index()
        .rename(columns={"role": "facet"})
        .sort_values(["n_docs", "facet"], ascending=[False, True])
        .reset_index(drop=True)
    )
    assert got["facet"].tolist() == expect["facet"].tolist()
    assert got["n_docs"].tolist() == expect["n_docs"].tolist()
    # same summation kernel + fold order → bit-identical maxima
    np.testing.assert_array_equal(
        got["top_score"].to_numpy(), expect["top_score"].to_numpy()
    )
    # the match set must be larger than any top-k page (facets are not
    # a histogram of the visible page)
    assert int(got["n_docs"].sum()) > 10


def test_facet_counts_empty_query(index):
    assert facet_counts(index, "zzznosuchterm", facet_col="role").count() == 0


# ---------------------------------------------------------------- fusion

def test_fuse_weighted_hand_computed(spark):
    rows = [
        # conv A: best title=2.0, best body=1.0  → 1.0*2.0 + 0.5*1.0 = 2.5
        ("A", 1, "title", 2.0), ("A", 2, "title", 1.5), ("A", 3, "body", 1.0),
        # conv B: title only                     → 1.0*3.0 = 3.0
        ("B", 4, "title", 3.0),
        # conv C: body only + unweighted field   → 0.5*4.0 = 2.0
        ("C", 5, "body", 4.0), ("C", 6, "footer", 9.0),
    ]
    cands = spark.createDataFrame(
        rows, "conv_id string, doc_id long, field string, score double"
    )
    got = (
        fuse_weighted(cands, "conv_id", {"title": 1.0, "body": 0.5})
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    assert got["conv_id"].tolist() == ["A", "B", "C"]
    assert got["fused_score"].tolist() == [2.5, 3.0, 2.0]
    # representative = largest weighted contribution
    assert got["doc_id"].tolist() == [1, 4, 5]
    assert got["field"].tolist() == ["title", "title", "body"]


@pytest.fixture(scope="module")
def field_index(spark, tmp_path_factory):
    from anisearch_model_spark.datagen import gen_transcripts
    from anisearch_model_spark.index.store import build_index

    d = str(tmp_path_factory.mktemp("fusedidx") / "main")
    tr = gen_transcripts(spark, 3000, seed=42)
    build_index(spark, tr, d, num_buckets=6, field_col="role")
    return IndexStore(spark, d)


def test_search_fields_fused_matches_oracle(field_index):
    weights = {"user": 1.0, "assistant": 0.5}
    meta = (
        field_index.doc_map.select("doc_id", "conv_id", "role", "text")
        .toPandas()
    )
    # oracle: per-role sub-corpus scoring → best per (conv, role) →
    # weighted sum → (fused DESC, doc ASC) top-10
    frames = []
    for role, w in weights.items():
        sub = meta[meta["role"] == role]
        scored = OracleIndex(
            sub[["doc_id", "text"]].sort_values("doc_id").reset_index(drop=True)
        ).score(Q)
        scored = scored.merge(sub[["doc_id", "conv_id"]], on="doc_id")
        scored["field"] = role
        scored["wscore"] = w * scored["score"]
        frames.append(scored)
    allm = pd.concat(frames, ignore_index=True)
    best = (
        allm.sort_values(["conv_id", "field", "score", "doc_id"],
                         ascending=[True, True, False, True])
        .groupby(["conv_id", "field"], as_index=False).first()
    )
    fused = best.groupby("conv_id", as_index=False).agg(
        fused_score=("wscore", "sum")
    )
    rep = best.sort_values(
        ["conv_id", "wscore", "field", "doc_id"],
        ascending=[True, False, True, True],
    ).groupby("conv_id", as_index=False).first()
    expect = fused.merge(rep[["conv_id", "doc_id", "field"]], on="conv_id")
    expect = expect.sort_values(
        ["fused_score", "doc_id"], ascending=[False, True]
    ).head(10).reset_index(drop=True)

    got = search_fields_fused(field_index, Q, weights, k=10).toPandas()
    assert got["conv_id"].tolist() == expect["conv_id"].tolist()
    # full precision both sides; tiny rel covers pandas-sum vs sorted-fold
    # association differences
    assert got["fused_score"].tolist() == pytest.approx(
        expect["fused_score"].tolist(), rel=1e-12, abs=0.0)
    assert got["doc_id"].tolist() == expect["doc_id"].tolist()
    assert got["rank"].tolist() == list(range(1, len(got) + 1))
    # fusion genuinely differs from max-only dedup: some fused score must
    # exceed its best single-field contribution (i.e. a multi-field conv)
    joined = got.merge(
        best.groupby("conv_id", as_index=False).agg(nf=("field", "nunique")),
        on="conv_id",
    )
    assert (joined["nf"] > 1).any()


# ----------------------------------------------------------------- MLT

def test_mlt_terms_deterministic_topm(index, oracle):
    doc = int(oracle.postings["doc_id"].iloc[0])
    terms = mlt_terms(index, doc, m=5)
    assert terms == mlt_terms(index, doc, m=5)
    assert 0 < len(terms) <= 5
    # expected from the oracle's own tf/df tables
    sub = oracle.postings[oracle.postings["doc_id"] == doc]
    idf = {
        t: float(np.log(1 + (oracle.n_docs - oracle.df[t] + 0.5)
                        / (oracle.df[t] + 0.5)))
        for t in sub["term"]
    }
    exp = sorted(
        ((-(r.tf * idf[r.term]), r.term) for r in sub.itertuples()),
    )[:5]
    assert terms == [t for _, t in exp]


def test_more_like_this_excludes_source_and_ranks(index, oracle):
    doc = int(oracle.postings["doc_id"].iloc[0])
    got = more_like_this(index, doc, m=5, k=10).toPandas()
    assert doc not in got["doc_id"].tolist()
    assert got["rank"].tolist() == list(range(1, len(got) + 1))
    assert len(got) == 10
    # rank-identical to the oracle scoring the same extracted terms
    q = " ".join(mlt_terms(index, doc, m=5))
    exp = oracle.score(q)
    exp = exp[exp["doc_id"] != doc].sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).head(10)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    np.testing.assert_array_equal(
        got["score"].to_numpy(), exp["score"].to_numpy()
    )
    # pruned and exhaustive agree
    got_ex = more_like_this(index, doc, m=5, k=10, pruned=False).toPandas()
    assert got["doc_id"].tolist() == got_ex["doc_id"].tolist()


def test_mlt_unknown_and_deleted_doc(spark, tmp_path_factory):
    from anisearch_model_spark.datagen import gen_transcripts
    from anisearch_model_spark.index.store import build_index
    from anisearch_model_spark.index.tombstones import delete_docs

    d = str(tmp_path_factory.mktemp("mltidx") / "main")
    tr = gen_transcripts(spark, 300, seed=7)
    build_index(spark, tr, d, num_buckets=2)
    idx = IndexStore(spark, d)
    with pytest.raises(ValueError, match="not found"):
        mlt_terms(idx, 10_000_000)
    delete_docs(spark, d, [0])
    with pytest.raises(ValueError, match="deleted"):
        mlt_terms(idx, 0)


# ------------------------------------------------------- serve/CLI wiring

def test_serve_loop_facets_mlt_fused_routes(spark, index_dir, field_index):
    """The three round-5 surfaces through serve mode: results match the
    direct module calls; route conflicts and bad params are per-request
    admission errors, never loop killers."""
    import io
    import json as _json

    from anisearch_model_spark.cli import serve_loop

    reqs = [
        _json.dumps({"query": Q, "facets": "role"}),
        _json.dumps({"mlt": 3, "k": 5}),
        _json.dumps({"query": "hero", "facets": "role", "mlt": 3}),  # conflict
        _json.dumps({"mlt": "abc"}),                                 # bad int
        _json.dumps({"query": "hero", "fused_fields": []}),          # bad type
        "quit",
    ]
    out = io.StringIO()
    served = serve_loop(spark, index_dir, io.StringIO("\n".join(reqs)),
                        out, log=False)
    assert served == 5
    lines = [_json.loads(x) for x in out.getvalue().strip().splitlines()]
    idx = IndexStore(spark, index_dir)
    want_facets = [r.asDict() for r in
                   facet_counts(idx, Q, facet_col="role").collect()]
    assert lines[0]["results"] == want_facets
    want_mlt = [r.asDict() for r in
                more_like_this(idx, 3, k=5).collect()]
    assert lines[1]["results"] == want_mlt
    assert "error" in lines[2] and "exclusive" in lines[2]["error"]
    assert "error" in lines[3]
    assert "error" in lines[4] and "fused_fields" in lines[4]["error"]

    # fused route needs the field-qualified index; dict and string
    # weight forms must agree
    weights = {"user": 1.0, "assistant": 0.5}
    reqs2 = [
        _json.dumps({"query": Q, "fused_fields": weights, "k": 5}),
        _json.dumps({"query": Q, "fused_fields": "user:1.0,assistant:0.5",
                     "k": 5}),
        "quit",
    ]
    out2 = io.StringIO()
    serve_loop(spark, field_index.index_dir,
               io.StringIO("\n".join(reqs2)), out2, log=False)
    l2 = [_json.loads(x) for x in out2.getvalue().strip().splitlines()]
    want_fused = [r.asDict() for r in
                  search_fields_fused(field_index, Q, weights, k=5).collect()]
    got_dict = l2[0]["results"]
    got_str = l2[1]["results"]
    assert got_dict == got_str
    assert [r["conv_id"] for r in got_dict] == \
        [str(r["conv_id"]) for r in want_fused]


def test_cli_mlt_subcommand(spark, index_dir, capsys):
    import json as _json

    from anisearch_model_spark import cli

    rc = cli.main(["mlt", "--index", index_dir, "--doc-id", "3", "--k", "5"])
    assert rc == 0
    rows = [_json.loads(x) for x in
            capsys.readouterr().out.strip().splitlines()]
    want = [r.asDict() for r in more_like_this(
        IndexStore(spark, index_dir), 3, k=5).collect()]
    assert [(r["rank"], r["doc_id"]) for r in rows] == \
        [(w["rank"], w["doc_id"]) for w in want]


# ------------------------------------------------------------- suggest

def test_suggest_terms_and_serve_route(spark, index_dir):
    import io
    import json as _json

    from anisearch_model_spark.cli import serve_loop
    from anisearch_model_spark.query.engine import suggest_terms

    idx = IndexStore(spark, index_dir)
    got = suggest_terms(idx, "te", n=5)
    assert 0 < len(got) <= 5
    assert all(t.startswith("te") for t, _ in got)
    # ordered by (df DESC, term ASC)
    assert got == sorted(got, key=lambda kv: (-kv[1], kv[0]))
    # n caps the expansion
    assert len(suggest_terms(idx, "te", n=2)) == 2
    with pytest.raises(ValueError):
        suggest_terms(idx, "   ")

    reqs = [
        _json.dumps({"suggest": "te", "k": 5}),
        _json.dumps({"suggest": 42}),          # bad type → error line
        "quit",
    ]
    out = io.StringIO()
    serve_loop(spark, index_dir, io.StringIO("\n".join(reqs)), out,
               log=False)
    lines = [_json.loads(x) for x in out.getvalue().strip().splitlines()]
    assert lines[0]["results"] == [{"term": t, "df": df} for t, df in got]
    assert "error" in lines[1]


def test_cli_suggest_subcommand(spark, index_dir, capsys):
    import json as _json

    from anisearch_model_spark import cli

    rc = cli.main(["suggest", "--index", index_dir, "--prefix", "te",
                   "--n", "3"])
    assert rc == 0
    rows = [_json.loads(x) for x in
            capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 3 and all(r["term"].startswith("te") for r in rows)


# --------------------------------------------------------------- count

def test_match_count_and_serve_count_route(spark, index_dir, oracle, capsys):
    import io
    import json as _json

    from anisearch_model_spark.cli import serve_loop
    from anisearch_model_spark.query.engine import match_count

    idx = IndexStore(spark, index_dir)
    assert match_count(idx, Q) == len(oracle.score(Q))
    assert match_count(idx, "zzznosuchterm") == 0

    out = io.StringIO()
    serve_loop(spark, index_dir,
               io.StringIO(_json.dumps({"query": Q, "count": True}) + "\nquit\n"),
               out, log=False)
    line = _json.loads(out.getvalue().strip().splitlines()[0])
    assert line["results"] == [{"n_matches": len(oracle.score(Q))}]

    from anisearch_model_spark import cli

    rc = cli.main(["search", "--index", index_dir, "--query", Q, "--count"])
    assert rc == 0
    got = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got == {"n_matches": len(oracle.score(Q))}


# ---------------------------------------------------------- idle clear

def test_clear_caches_preserves_results(spark, index_dir):
    from anisearch_model_spark.query.engine import search

    idx = IndexStore(spark, index_dir)
    before = [r.asDict() for r in search(idx, Q, k=5).collect()]
    assert idx._df_cache  # queries populated the LRU
    idx.clear_caches()
    assert not idx._df_cache and idx._manifest_cache is None
    after = [r.asDict() for r in search(idx, Q, k=5).collect()]
    assert before == after


def test_serve_loop_idle_clear(spark, index_dir, monkeypatch):
    import io
    import json as _json
    import time as _time

    from anisearch_model_spark.cli import serve_loop

    calls = []
    monkeypatch.setattr(IndexStore, "clear_caches",
                        lambda self: calls.append(1), raising=True)

    def reqs():
        yield _json.dumps({"query": "hero", "k": 2}) + "\n"
        _time.sleep(0.05)
        yield _json.dumps({"query": "hero", "k": 2}) + "\n"
        yield "quit\n"

    out = io.StringIO()
    served = serve_loop(spark, index_dir, reqs(), out, log=False,
                        idle_clear_sec=0.01)
    assert served == 2
    # only the post-gap request triggers the clear
    assert len(calls) == 1
