"""Round-6 optimization harness: per-query isolation + plan capture.

bench.py is FROZEN for measurement, so every extra instrument lives here:

  * times each headline entry with the noop sink (guide §1.4) after one
    untimed warmup of the session;
  * captures ``.explain("formatted")`` for each query into
    ``plans/r06/<name>_<tag>.txt`` (judge-checkable plan evidence);
  * ``--stages dedup_minhash`` etc. run sub-stage isolation for the
    expensive composites so the optimization targets the right stage;
  * prints one JSON line mirroring bench.py's per-query dict so
    before/after diffs are mechanical.

Usage:
    python bench_extra.py [--tag before] [--plans] [--only name,name]
    python bench_extra.py --stages dedup_minhash
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


HEADLINE = [
    "q1_pricing_summary", "j2_key_rename_join", "t1_topk_per_group",
    "multifield_entity_topk", "events_sessionize", "tx_quality",
    "dedup_exact", "dedup_minhash", "sim_cosine_topk", "sim_ann_lsh",
    "etl_merge_pipeline", "bm25_topk_documents",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--only", default="")
    ap.add_argument("--stages", default="")
    ap.add_argument("--engine", action="store_true",
                    help="also run the engine part (index build, queries)")
    ap.add_argument("--turns", type=int,
                    default=int(os.environ.get("BENCH_TURNS", "500000")))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from bench import _host_probe
    from anisearch_model_spark.session import get_spark

    spark = get_spark(app_name="asms-bench-extra", cores=cpus)
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    qs = entry_mod.queries()
    # untimed warmup (same as bench.py)
    from pyspark.sql import functions as F
    _noop(spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .groupBy("l_returnflag").count())

    out: dict = {"probe_start": _host_probe()}
    timings: dict[str, float] = {}

    if args.stages:
        for target in args.stages.split(","):
            stage_fn = globals().get(f"stages_{target}")
            if stage_fn is None:
                print(f"no stage breakdown for {target}", file=sys.stderr)
                continue
            out[f"stages_{target}"] = stage_fn(spark, sf_dir)
    else:
        names = [n for n in (args.only.split(",") if args.only else HEADLINE)
                 if n]
        for name in names:
            spark.sparkContext.setJobDescription(f"r06:{name}")
            df = qs[name](spark, sf_dir)
            if args.plans:
                with open(os.path.join(plans_dir,
                                       f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(_plan_text(df))
            t0 = time.time()
            _noop(qs[name](spark, sf_dir))
            timings[name] = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
        out["queries"] = timings

    if args.engine:
        out["engine"] = engine_part(spark, args.turns, plans_dir, args.tag,
                                    args.plans)

    out["probe_end"] = _host_probe()
    print(json.dumps(out))
    spark.stop()


def engine_part(spark, n_turns: int, plans_dir: str, tag: str,
                plans: bool) -> dict:
    """index_build + positions_build + query paths on the synthetic corpus
    (mirrors bench.py lines 107-176, but with phase timings exposed)."""
    import shutil

    from anisearch_model_spark.datagen import gen_transcripts
    from anisearch_model_spark.index.store import build_index
    from anisearch_model_spark.index.positions import build_positions
    from anisearch_model_spark.query.engine import IndexStore, search, topk_bmw
    from anisearch_model_spark.query.phrase import phrase_topk

    d: dict = {}
    idx_dir = "/tmp/asms_bench_extra_index"
    shutil.rmtree(idx_dir, ignore_errors=True)
    tr = gen_transcripts(spark, n_turns, seed=42)
    t0 = time.time()
    metrics = build_index(spark, tr, idx_dir, num_buckets=32)
    d["index_build"] = round(time.time() - t0, 3)
    d["index_build_phases"] = metrics.get("phases")

    idx = IndexStore(spark, idx_dir)
    t0 = time.time()
    for q in ["hero battle magic world", "robot space pirate",
              "shadow light king"]:
        _noop(topk_bmw(idx, q, 10))
    d["bm25_query_x3"] = round(time.time() - t0, 3)
    t0 = time.time()
    for q in ["hero battle magic world", "robot space pirate",
              "shadow light king"]:
        search(idx, q, 10).collect()
    d["search_e2e_x3"] = round(time.time() - t0, 3)

    t0 = time.time()
    build_positions(spark, idx_dir)
    d["positions_build"] = round(time.time() - t0, 3)
    t0 = time.time()
    for q in ["hero battle", "space pirate", "shadow light"]:
        _noop(phrase_topk(idx, q, 10))
    d["phrase_query_x3"] = round(time.time() - t0, 3)

    from anisearch_model_spark.query.facets import facet_counts
    from anisearch_model_spark.query.mlt import more_like_this

    t0 = time.time()
    _noop(facet_counts(idx, "hero battle magic world", facet_col="role"))
    d["facets_query"] = round(time.time() - t0, 3)
    t0 = time.time()
    for did in (7, n_turns // 3, (2 * n_turns) // 3):
        _noop(more_like_this(idx, did, m=5, k=10))
    d["mlt_query_x3"] = round(time.time() - t0, 3)

    import pandas as pd
    from anisearch_model_spark.query.batch import batch_topk

    words = ["hero", "battle", "magic", "world", "robot", "space", "pirate",
             "music", "dance", "love", "war", "peace", "king", "queen",
             "dragon", "shadow", "light", "night", "city", "future"]
    queries = pd.DataFrame(
        {"query_id": range(20),
         "query_text": [f"{words[i]} {words[(i + 3) % 20]} {words[(i + 7) % 20]}"
                        for i in range(20)]})
    t0 = time.time()
    _noop(batch_topk(idx, queries, k=10))
    d["bm25_batch_x20"] = round(time.time() - t0, 3)
    return d


def stages_dedup_minhash(spark, sf_dir: str) -> dict:
    """Sub-stage isolation for the suite's heaviest query."""
    from pyspark.sql import functions as F

    from anisearch_model_spark.operators.dedup import (
        _fresh_token_cache,
        _verify_jaccard,
        minhash_signature_arrays,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out: dict = {}

    t0 = time.time()
    toks = _fresh_token_cache(d, "doc_id", "text", 1)
    _noop(toks)
    out["tokens"] = round(time.time() - t0, 3)

    t0 = time.time()
    sig = minhash_signature_arrays(d, "doc_id", "text", 16, toks=toks)
    _noop(sig)
    out["signatures"] = round(time.time() - t0, 3)

    n_bands = 4
    band_size = 4
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(*[
                F.md5(F.concat_ws(
                    "", F.slice("sigs", b * band_size + 1, band_size)))
                for b in range(n_bands)
            ])
        ).alias("band", "band_key"),
    )
    cand = (
        bands.alias("a").join(bands.alias("b"), ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    t0 = time.time()
    _noop(cand)
    out["candidates"] = round(time.time() - t0, 3)
    out["n_candidates"] = cand.count()

    t0 = time.time()
    _noop(_verify_jaccard(cand, toks, 0.8))
    out["verify"] = round(time.time() - t0, 3)
    return out


if __name__ == "__main__":
    main()
