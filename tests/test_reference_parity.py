"""Reference-parity tests on the FIXTURES.md §5 multi-field entity shape.

The reference's query pipeline (src/api.py:316-349, 427-466) over wide
multi-synopsis rows: per-field scores → per-field top-k → merge → skip
blank-synopsis rows → dedup by title keeping the best → rank → paginate.
A hand-rolled pandas implementation of EXACTLY those semantics (with the
engine's explicit tie-breaks) is the oracle here; the Spark pipeline must
match it row for row.  Also covers edge builds (single doc, empty text).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _fixture_frame():
    """entity_id, title, field_a..c with duplicate titles, cross-field
    duplicate text, all-blank rows (FIXTURES.md §5)."""
    rng = np.random.default_rng(9)
    rows = []
    for e in range(40):
        title = f"title-{e % 25:02d}"  # duplicate titles across entities
        fields = {}
        for f in ("field_a", "field_b", "field_c"):
            if rng.random() < 0.2:
                fields[f] = None
            else:
                fields[f] = " ".join(
                    rng.choice(["hero", "battle", "magic", "world", "noise",
                                "filler", "space"], size=rng.integers(2, 8))
                )
        if e % 10 == 9:
            fields = {f: "  " for f in fields}  # all-blank row (P7 skip)
        if e % 7 == 3:
            fields["field_b"] = fields["field_a"]  # cross-field dup (A2)
        rows.append({"entity_id": e, "title": title, **fields})
    return pd.DataFrame(rows)


def _score(text: str | None, query_terms: set[str]) -> float | None:
    """Simple per-field score for parity testing: term overlap count."""
    if text is None or not text.strip():
        return None
    toks = text.split()
    return float(sum(t in query_terms for t in toks))


def _pandas_reference(pdf: pd.DataFrame, query_terms: set[str], k: int,
                      page: int, rpp: int) -> pd.DataFrame:
    """Reference semantics with the engine's explicit tie-breaks."""
    cands = []
    for f in ("field_a", "field_b", "field_c"):
        scored = [
            (int(r.entity_id), r.title, f, _score(getattr(r, f), query_terms))
            for r in pdf.itertuples()
        ]
        scored = [s for s in scored if s[3] is not None and s[3] > 0]
        scored.sort(key=lambda s: (-s[3], s[0]))
        cands.extend(scored[:k])
    # dedup by title keeping best (score desc, field asc, entity asc)
    cands.sort(key=lambda s: (-s[3], s[2], s[0]))
    seen, dedup = set(), []
    for s in cands:
        if s[1] in seen:
            continue
        seen.add(s[1])
        dedup.append(s)
    dedup.sort(key=lambda s: (-s[3], s[0]))
    out = pd.DataFrame(dedup, columns=["entity_id", "title", "field", "score"])
    out.insert(0, "rank", range(1, len(out) + 1))
    return out[(out["rank"] > (page - 1) * rpp) & (out["rank"] <= page * rpp)]


@pytest.mark.parametrize("page", [1, 2])
def test_multifield_reference_parity(spark, page):
    from anisearch_model_spark.query.multifield import multifield_search

    pdf = _fixture_frame()
    query_terms = {"hero", "battle", "magic"}
    k, rpp = 50, 5

    sdf = spark.createDataFrame(
        pdf, "entity_id long, title string, field_a string, field_b string, field_c string"
    )
    # unpivot fields, score, drop blank/zero — mirrors reference's
    # per-column score dict + blank-synopsis skip
    long = sdf.selectExpr(
        "entity_id", "title",
        "stack(3, 'field_a', field_a, 'field_b', field_b, 'field_c', field_c) as (field, text)",
    ).filter(F.length(F.trim(F.coalesce(F.col("text"), F.lit("")))) > 0)
    term_arr = F.split(F.col("text"), " ")
    score = F.aggregate(
        term_arr,
        F.lit(0.0),
        lambda acc, t: acc
        + F.when(t.isin(list(query_terms)), F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    scored = long.select(
        F.col("entity_id").alias("item_id"),
        F.col("title").alias("entity"),
        "field",
        score.alias("score"),
    ).filter(F.col("score") > 0)

    got = (
        __import__("anisearch_model_spark.query.multifield", fromlist=["multifield_search"])
        .multifield_search(
            scored, key_col="entity", k=k, page=page, results_per_page=rpp,
            field_col="field", score_col="score", id_col="item_id",
        )
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    expect = _pandas_reference(pdf, query_terms, k, page, rpp).reset_index(drop=True)
    assert got["entity"].tolist() == expect["title"].tolist()
    assert got["rank"].tolist() == expect["rank"].tolist()
    np.testing.assert_allclose(got["score"], expect["score"], atol=1e-12)


def test_engine_pagination(spark, index_dir):
    from anisearch_model_spark.query.engine import IndexStore, search, topk_exhaustive

    idx = IndexStore(spark, index_dir)
    full = topk_exhaustive(idx, "hero battle magic", 20).toPandas()
    p1 = search(idx, "hero battle magic", k=10, page=1).toPandas()
    p2 = search(idx, "hero battle magic", k=10, page=2).toPandas()
    assert p1["doc_id"].tolist() == full["doc_id"].tolist()[:10]
    assert p2["doc_id"].tolist() == full["doc_id"].tolist()[10:20]
    assert p2["rank"].tolist() == list(range(11, 21))


def test_build_single_doc(spark, tmp_path):
    from anisearch_model_spark.index.store import build_index
    from anisearch_model_spark.query.engine import IndexStore, topk_exhaustive

    tr = spark.createDataFrame(
        [("c1", 0, "user", "lonely single document hero", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    d = str(tmp_path / "single")
    m = build_index(spark, tr, d, num_buckets=4)
    assert m["n_docs"] == 1
    idx = IndexStore(spark, d)
    out = topk_exhaustive(idx, "hero", 5).toPandas()
    assert out["doc_id"].tolist() == [0]


def test_build_with_empty_texts(spark, tmp_path):
    from anisearch_model_spark.index.store import build_index
    from anisearch_model_spark.query.engine import IndexStore, topk_exhaustive

    rows = [("c1", i, "user", "" if i % 2 else "hero text", None, None) for i in range(10)]
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    d = str(tmp_path / "empties")
    m = build_index(spark, tr, d, num_buckets=2)
    assert m["n_docs"] == 10  # empty docs still counted (avgdl denominator)
    idx = IndexStore(spark, d)
    assert idx.stats["avgdl"] == pytest.approx(1.0)  # 5 docs × 2 tokens / 10
    out = topk_exhaustive(idx, "hero", 10).toPandas()
    assert len(out) == 5
