"""E2E rank-identity: distributed engine vs single-node oracle (the
north-rule correctness gate, BASELINE.json:2,6,14).

The oracle (pure pandas/NumPy BM25, query/oracle.py) stands in for the
reference's single-node scorer (src/test.py:140-218).  Top-k docIDs must
match exactly and scores must be BIT-identical (same float64 kernel, same
ascending-term summation order)."""

import numpy as np
import pandas as pd
import pytest

from anisearch_model_spark.query.engine import IndexStore, topk_bmw, topk_exhaustive
from anisearch_model_spark.query.oracle import OracleIndex

REFERENCE_QUERIES = [
    "hero battle magic world",          # common terms
    "robot space pirate music dance",   # mid-frequency
    "story",                            # single hot term
    "term0042 dragon",                  # rare + common mix
    "the and of a",                     # stopword-only → empty result
    "zzz-unseen-term",                  # unseen term → empty result
    "CAFÉ naïve HERO",                  # unicode + case folding
    "it's a hero they can't forget",    # contractions
    "visit http://example.com hero",    # URL stripped, 'hero' survives
    "shadow light king queen dragon night city",  # many terms
]


@pytest.fixture(scope="module")
def oracle(spark, index_dir):
    idx = IndexStore(spark, index_dir)
    docs = (
        idx.doc_map.select("doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return OracleIndex(docs)


@pytest.fixture(scope="module")
def index(spark, index_dir):
    return IndexStore(spark, index_dir)


@pytest.mark.parametrize("q", REFERENCE_QUERIES)
def test_exhaustive_rank_identity(index, oracle, q):
    expect = oracle.topk(q, 10)
    got = topk_exhaustive(index, q, 10).toPandas()
    assert got["doc_id"].tolist() == expect["doc_id"].tolist()
    assert got["rank"].tolist() == expect["rank"].tolist()
    if len(expect):
        np.testing.assert_array_equal(  # BIT-identical, not approx
            got["score"].to_numpy(), expect["score"].to_numpy()
        )


@pytest.mark.parametrize("q", REFERENCE_QUERIES[:4] + REFERENCE_QUERIES[6:8])
def test_bmw_matches_exhaustive(index, oracle, q):
    expect = oracle.topk(q, 10)
    got = topk_bmw(index, q, 10).toPandas()
    assert got["doc_id"].tolist() == expect["doc_id"].tolist()
    if len(expect):
        np.testing.assert_array_equal(got["score"].to_numpy(), expect["score"].to_numpy())


def test_stats_match_oracle(index, oracle):
    assert index.stats["n_docs"] == oracle.n_docs
    assert index.stats["avgdl"] == pytest.approx(oracle.avgdl, abs=1e-12)


def test_search_metadata_join(spark, index):
    from anisearch_model_spark.query.engine import search

    out = search(index, "hero battle", k=5).toPandas()
    assert list(out.columns) == ["rank", "doc_id", "conv_id", "turn_idx", "role", "score"]
    assert out["rank"].tolist() == list(range(1, len(out) + 1))
    assert out["conv_id"].notna().all()
