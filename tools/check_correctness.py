"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB
(row count + schema-insensitive, order-insensitive value comparison).

Usage: cd /root/repo && python tools/check_correctness.py [sf_dir] [query ...]
(optional query names restrict the run to those entries)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    df = obj.to_pandas()  # ray Dataset
    if df.empty and not len(df.columns) and hasattr(obj, "schema"):
        # Ray to_pandas drops columns on an all-empty dataset even though
        # schema() knows them — rebuild the typed empty frame
        df = pd.DataFrame({n: [] for n in obj.schema().names})
    return df


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            ray_df = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            results[name] = f"RAY-ERROR {type(e).__name__}: {e}"
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            results[name] = f"rows-only ({len(ray_df)} rows, {dt:.1f}s)"
            continue
        try:
            duck_df = canon(con.execute(oracles[name]).df())
        except Exception as e:
            results[name] = f"SQL-ERROR {type(e).__name__}: {e}"
            continue
        if len(ray_df) != len(duck_df):
            results[name] = f"ROWCOUNT MISMATCH ray={len(ray_df)} sql={len(duck_df)}"
            continue
        if list(ray_df.columns) != list(duck_df.columns):
            results[name] = f"COLUMNS MISMATCH ray={list(ray_df.columns)} sql={list(duck_df.columns)}"
            continue
        mismatched = []
        for col in ray_df.columns:
            a, b = ray_df[col], duck_df[col]
            try:
                import pandas as pd

                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    ok = (a.astype(float).fillna(-1e308) == b.astype(float).fillna(-1e308)).all()
                else:
                    ok = (a.astype(str) == b.astype(str)).all()
            except Exception as e:
                ok = False
            if not ok:
                mismatched.append(col)
        if mismatched:
            results[name] = f"VALUE MISMATCH in {mismatched}"
            ex = None
            for col in mismatched:
                neq = ray_df[col].astype(str) != duck_df[col].astype(str)
                i = neq.idxmax()
                print(f"  [{name}] first diff col={col} row={i}: ray={ray_df[col][i]!r} sql={duck_df[col][i]!r}")
        else:
            results[name] = f"MATCH ({len(ray_df)} rows, {dt:.1f}s)"

    width = max(len(n) for n in results)
    fails = 0
    for name, res in results.items():
        flag = "" if ("MATCH (" in res or "rows-only" in res) else "  <-- FAIL"
        if flag:
            fails += 1
        print(f"{name:<{width}}  {res}{flag}")
    print(f"\n{len(results) - fails}/{len(results)} ok")
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
