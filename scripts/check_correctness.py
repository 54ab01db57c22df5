"""Local mirror of the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB — row count,
schema (column names), and order-insensitive value hash.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize: round floats, stringify, sort rows
    norm = df.copy()
    for c in norm.columns:
        if norm[c].dtype.kind == "f":
            norm[c] = norm[c].round(6)
    rows = sorted(norm.astype(str).apply("|".join, axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(a for a in args if not os.path.isdir(a))
    record = {}

    import ray
    if not ray.is_initialized():
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            record[name] = {"status": "fail",
                            "error": f"{type(e).__name__}: {e}"}
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(res)} (rows-only, {dt:.1f}s)")
            record[name] = {"status": "rows_only", "rows": len(res),
                            "sec": round(dt, 2)}
            n_pass += 1
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record[name] = {"status": "fail", "error": f"oracle SQL: {e}"}
            n_fail += 1
            continue
        problems = []
        if len(res) != len(exp):
            problems.append(f"rows {len(res)} != {len(exp)}")
        if sorted(res.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(res.columns)} != {sorted(exp.columns)}")
        if not problems and value_hash(res) != value_hash(exp):
            problems.append("value hash mismatch")
        record[name] = {
            "status": "fail" if problems else "pass",
            "rows_match": len(res) == len(exp),
            "schema_match": sorted(res.columns) == sorted(exp.columns),
            "hash_match": not problems,
            "rows": len(res), "sec": round(dt, 2),
        }
        if problems:
            record[name]["problems"] = problems
            print(f"FAIL {name}: {'; '.join(problems)} ({dt:.1f}s)")
            if "value hash mismatch" in problems:
                merged = res.reindex(sorted(res.columns), axis=1)
                expected = exp.reindex(sorted(exp.columns), axis=1)
                print("  ray head:\n", merged.sort_values(
                    list(merged.columns)).head(3).to_string())
                print("  sql head:\n", expected.sort_values(
                    list(expected.columns)).head(3).to_string())
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(res)} ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        import json
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "queries": record}, f, indent=1, default=str)
        print(f"wrote {json_out}")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
