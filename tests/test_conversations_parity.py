"""Conversation-level search parity: Spark search_conversations vs a
pandas oracle implementing the same semantics (best turn per conversation,
reference title-dedup analog src/api.py:427-455)."""

import numpy as np
import pandas as pd
import pytest

from anisearch_model_spark.query.engine import IndexStore
from anisearch_model_spark.query.multifield import search_conversations
from anisearch_model_spark.query.oracle import OracleIndex


@pytest.fixture(scope="module")
def setup(spark, index_dir):
    idx = IndexStore(spark, index_dir)
    meta = (
        idx.doc_map.select("doc_id", "conv_id", "turn_idx", "role", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    oracle = OracleIndex(meta[["doc_id", "text"]])
    return idx, oracle, meta


def _oracle_conversations(oracle, meta, q, k):
    scored = oracle.score(q)
    if scored.empty:
        return scored.assign(rank=[], conv_id=[])
    j = scored.merge(meta[["doc_id", "conv_id", "role"]], on="doc_id")
    # dedup by conv keeping best (score desc, role asc, doc_id asc)
    j = j.sort_values(["score", "role", "doc_id"],
                      ascending=[False, True, True], kind="mergesort")
    best = j.drop_duplicates("conv_id", keep="first")
    best = best.sort_values(["score", "doc_id"], ascending=[False, True],
                            kind="mergesort").head(k)
    best = best.reset_index(drop=True)
    best.insert(0, "rank", np.arange(1, len(best) + 1))
    return best


@pytest.mark.parametrize("q", ["hero battle magic world", "story", "robot space pirate"])
def test_conversation_search_parity(spark, setup, q):
    idx, oracle, meta = setup
    got = search_conversations(idx, q, k=8).toPandas()
    expect = _oracle_conversations(oracle, meta, q, 8)
    assert got["conv_id"].tolist() == expect["conv_id"].tolist()
    assert got["doc_id"].tolist() == expect["doc_id"].tolist()
    np.testing.assert_array_equal(
        got["score"].to_numpy(), expect["score"].to_numpy()
    )


def test_blank_turn_skip_parity(spark, tmp_path):
    """Reference src/api.py:427-455 skips blank-synopsis rows BEFORE the
    title dedup.  Inject blank/whitespace turns into conversations whose
    other turns rank; the engine must match a pandas reference that
    implements the skip (blank turns never become a conversation's best
    turn, never shift ranks)."""
    from anisearch_model_spark.index.store import build_index

    rows = []
    for i in range(40):
        rows.append((f"c{i:03d}", 0, "user", f"hero battle number {i}", None, None))
        rows.append((f"c{i:03d}", 1, "assistant", "", None, None))       # blank
        rows.append((f"c{i:03d}", 2, "assistant", "   ", None, None))    # spaces
        rows.append((f"c{i:03d}", 3, "user", f"filler text {i}", None, None))
    tr = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                    "tool", "ts"]),
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    d = str(tmp_path / "blank_idx")
    build_index(spark, tr, d, num_buckets=2)
    idx = IndexStore(spark, d)
    meta = (
        idx.doc_map.select("doc_id", "conv_id", "turn_idx", "role", "text")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    oracle = OracleIndex(meta[["doc_id", "text"]])
    # pandas reference WITH the blank skip
    nonblank = meta[meta["text"].fillna("").str.strip() != ""]
    got = search_conversations(idx, "hero battle", k=10).toPandas()
    expect = _oracle_conversations(
        oracle, nonblank, "hero battle", 10)
    assert got["conv_id"].tolist() == expect["conv_id"].tolist()
    assert got["doc_id"].tolist() == expect["doc_id"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(), expect["score"].to_numpy())
    # blank turns never surface
    blank_ids = set(meta.loc[meta["text"].fillna("").str.strip() == "", "doc_id"])
    assert not set(got["doc_id"]) & blank_ids


def test_adaptive_overfetch_fills_page_under_hot_conversation(spark, tmp_path):
    """One conversation owns the top 60 turns for the query — a fixed
    5·page·k candidate pool (k=10 → 50 turns) dedups to ONE conv_id and
    under-fills page 1 even though 10 more matching conversations exist.
    The adaptive over-fetch must double the pool until the page holds k
    distinct conversations (contract anchor: reference dedup-then-
    paginate src/api.py:427-466)."""
    import datetime as dt

    from anisearch_model_spark.index.store import build_index
    from anisearch_model_spark.query.multifield import search_conversations

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # hot conversation: 60 SHORT turns → highest BM25 scores for "zebra"
    for i in range(60):
        rows.append(("conv_hot", i, "user", f"zebra quick w{i}", None, t0))
    # 10 other conversations: one LONG matching turn each (lower score)
    filler = " ".join(f"pad{j}" for j in range(30))
    for c in range(10):
        rows.append((f"conv_{c:02d}", 0, "user", f"zebra {filler}", None, t0))
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    d = str(tmp_path / "hot_idx")
    build_index(spark, spark.createDataFrame(rows, schema), d, num_buckets=3)

    from anisearch_model_spark.query.engine import IndexStore

    idx = IndexStore(spark, d)
    for pruned in (True, False):
        got = search_conversations(idx, "zebra", k=10, pruned=pruned).toPandas()
        assert len(got) == 10, "page 1 under-filled despite 11 matching convs"
        assert got["conv_id"].is_unique
        assert got.loc[0, "conv_id"] == "conv_hot"  # best turn still wins
        assert set(got["conv_id"][1:]) <= {f"conv_{c:02d}" for c in range(10)}
        assert got["rank"].tolist() == list(range(1, 11))
