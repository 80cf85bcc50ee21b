"""did_you_mean (query/spell.py): distance-first candidate ranking,
pass-through of known terms, and the serve route."""

import json

from anisearch_model_spark.query.engine import IndexStore
from anisearch_model_spark.query.spell import did_you_mean


def test_misspelling_corrected_distance_first(spark, index_dir):
    idx = IndexStore(spark, index_dir)
    out = did_you_mean(idx, "herro battle")
    assert out["changed"] is True
    assert out["query"] == "hero battle"  # known term untouched
    cands = out["suggestions"]["herro"]
    assert cands[0]["term"] == "hero" and cands[0]["distance"] == 1
    # ranking is (distance ASC, df DESC, term ASC)
    assert [c["distance"] for c in cands] == sorted(
        c["distance"] for c in cands)


def test_known_query_passes_through(spark, index_dir):
    idx = IndexStore(spark, index_dir)
    out = did_you_mean(idx, "hero battle magic")
    assert out == {"query": "hero battle magic", "changed": False,
                   "suggestions": {}}


def test_hopeless_term_kept_verbatim(spark, index_dir):
    idx = IndexStore(spark, index_dir)
    out = did_you_mean(idx, "qqqqqqqqqqqqqqqq hero")
    assert out["changed"] is False
    assert out["query"] == "qqqqqqqqqqqqqqqq hero"
    assert out["suggestions"]["qqqqqqqqqqqqqqqq"] == []


def test_spell_serve_route(spark, index_dir):
    import io

    from anisearch_model_spark.cli import serve_loop

    reqs = "\n".join([
        json.dumps({"spell": "herro battle"}),
        json.dumps({"spell": "   "}),            # blank → admission error
        json.dumps({"spell": "x", "suggest": "y"}),  # exclusive
    ]) + "\n"
    out = io.StringIO()
    served = serve_loop(spark, index_dir, io.StringIO(reqs), out, log=False)
    lines = [json.loads(ln) for ln in out.getvalue().splitlines()]
    assert served == 3
    assert lines[0]["results"][0]["query"] == "hero battle"
    assert "error" in lines[1]
    assert "error" in lines[2] and "mutually exclusive" in lines[2]["error"]
