"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
same sf, compare row-count, column names, and (order-insensitively)
values.

Emits INCREMENTALLY: with ``--json PATH`` the per-entry verdict map is
atomically rewritten (tmp + rename) after EVERY entry, so a timeout or
kill mid-run still leaves a parseable partial JSON instead of ``{}``
(the round-3 driver gate died mid-run and recorded nothing).

Usage: python tools/check_entry.py [--json PATH] [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _flush(path: str | None, results: dict) -> None:
    """Atomic partial-progress write: tmp file + rename so a reader never
    sees a torn JSON, and a kill between entries loses at most the entry
    in flight."""
    if not path:
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def main() -> int:
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry_mod
    from anisearch_model_spark.session import get_spark

    spark = get_spark(app_name="check-entry", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    failures = []
    results: dict[str, dict] = {}
    _flush(json_path, results)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec: dict = {"status": "running"}
        results[name] = rec
        _flush(json_path, results)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            rec.update(status="fail", error=f"spark error: {e}"[:500],
                       sec=round(time.time() - t0, 2))
            _flush(json_path, results)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in osql:
            rec.update(status="rows_only", rows=len(sdf),
                       sec=round(time.time() - t0, 2))
            _flush(json_path, results)
            print(f"ROWS-ONLY {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(osql[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            rec.update(status="fail", error=f"duckdb error: {e}"[:500],
                       sec=round(time.time() - t0, 2))
            _flush(json_path, results)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        status = []
        if len(sdf) != len(ddf):
            status.append(f"rowcount {len(sdf)} != {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            status.append(f"schema {sorted(sdf.columns)} != {sorted(ddf.columns)}")
        if not status:
            a, b = canon(sdf), canon(ddf)
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-6, rtol=0)
            except AssertionError as e:
                status.append(f"values differ: {str(e)[:300]}")
        if status:
            failures.append(name)
            rec.update(status="fail", error="; ".join(status)[:500],
                       rows=len(sdf), sec=round(time.time() - t0, 2))
            print(f"FAIL {name}: {'; '.join(status)}  [{time.time()-t0:.1f}s]")
        else:
            rec.update(status="ok", rows=len(sdf), sec=round(time.time() - t0, 2))
            print(f"OK   {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
        _flush(json_path, results)

    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
