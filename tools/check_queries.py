"""Local stand-in for the driver's correctness gate: run every
queries() entry at a given sf_dir and compare against oracle_sql()
via DuckDB (row count + column names + order-insensitive value hash).

Usage: python tools/check_queries.py [sf_dir] [only_query ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(obj, rd.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    assert isinstance(obj, pd.DataFrame), type(obj)
    return obj


def value_hash(df):
    from collections import Counter

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith("string"):
            df[c] = df[c].astype("string")
    rows = Counter(tuple(str(v) for v in row) for row in df.itertuples(index=False))
    return hash(frozenset(rows.items()))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb

    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
            elapsed = round(time.time() - t0, 2)
            if name in oracles:
                want = con.execute(oracles[name]).df()
                ok_rows = len(got) == len(want)
                ok_cols = sorted(got.columns) == sorted(want.columns)
                ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
                results[name] = {
                    "status": "MATCH" if (ok_rows and ok_cols and ok_hash) else "MISMATCH",
                    "rows": [len(got), len(want)],
                    "cols_ok": ok_cols,
                    "hash_ok": ok_hash,
                    "sec": elapsed,
                }
                if not ok_cols:
                    results[name]["cols"] = [sorted(got.columns), sorted(want.columns)]
            else:
                results[name] = {
                    "status": "ROWS_ONLY",
                    "rows": [len(got), None],
                    "sec": elapsed,
                }
        except Exception as e:  # noqa: BLE001
            import traceback

            results[name] = {"status": "ERROR", "error": f"{type(e).__name__}: {e}"}
            traceback.print_exc()
        print(name, "->", json.dumps(results[name]), flush=True)

    bad = [n for n, r in results.items() if r["status"] in ("MISMATCH", "ERROR")]
    print(json.dumps({"total": len(results), "bad": bad}))
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
