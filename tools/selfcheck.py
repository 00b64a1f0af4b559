#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus `oracle_sql.json`,
runs each oracle SQL in DuckDB over the same scale-factor parquet tables,
and compares: schema (column names + dtypes), row count, and an
order-insensitive exact value comparison.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [nameFilter] [timeoutSec] [mode]

  nameFilter: comma-separated query names ("-" = all, the default).
  timeoutSec: per-oracle wall budget; a DuckDB run past it is interrupted
      and reported as "TIMEOUT" (counted separately from FAIL, and the
      exit code stays 0 if everything else passes). Used for the big
      scale rungs (sf1/sf10) where a handful of deliberately-quadratic
      audit oracles would otherwise dominate the sweep.
  mode: "rowkey" (default) = the original order-insensitive exact compare
      in Python — repr-stable per value, byte-exact on floats. "fast" =
      the same schema/dtype/count checks, but value equality via DuckDB
      EXCEPT ALL in both directions (multiset-exact, engine-side): at
      sf10 a 16M-row output takes ~10 min to CHECK in rowkey mode
      (~100k rows/s of Python) and seconds in fast mode. Caveat: fast
      mode compares floats by VALUE with NaN = NaN (DuckDB DISTINCT
      semantics), so it cannot distinguish -0.0 from 0.0 or two NaN
      payloads the way repr does — use rowkey mode when a query's
      contract hangs on float bit patterns.
"""
import json
import math
import sys
import threading
import time
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize for comparison: tuples of repr-stable values
    return df


def rows_key(df: pd.DataFrame):
    out = []
    for row in df.itertuples(index=False):
        key = []
        for v in row:
            if isinstance(v, float):
                key.append(("f", repr(v)))  # exact bit pattern via repr
            elif v is None or (isinstance(v, float) and math.isnan(v)):
                key.append(("null",))
            else:
                key.append((type(v).__name__, str(v)))
        out.append(tuple(key))
    return sorted(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).is_dir():  # Spark directory layout (ScaleUp output)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif Path(p).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    only = None
    if len(sys.argv) > 3 and sys.argv[3] != "-":
        only = set(sys.argv[3].split(","))
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else None
    fast = len(sys.argv) > 5 and sys.argv[5] == "fast"
    n_pass = n_fail = n_timeout = 0
    for name, sql in sorted(oracles.items()):
        if only is not None and name not in only:
            continue
        spark_path = f"{out_dir}/{name}"
        if not Path(spark_path).exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        timed_out = threading.Event()
        timer = None
        if timeout is not None:
            def kill(c=con, ev=timed_out):
                ev.set()
                c.interrupt()
            timer = threading.Timer(timeout, kill)
            timer.start()
        t0 = time.monotonic()
        try:
            if fast:
                sp = (f"read_parquet('{spark_path}/*.parquet')"
                      if Path(spark_path).is_dir()
                      else f"read_parquet('{spark_path}')")
                got0 = con.execute(f"SELECT * FROM {sp} LIMIT 0").df()
                con.execute(
                    f"CREATE OR REPLACE TEMP VIEW _want AS ({sql})")
                want0 = con.execute("SELECT * FROM _want LIMIT 0").df()
                got0, want0 = canon(got0), canon(want0)
                problems = []
                if list(got0.columns) != list(want0.columns):
                    problems.append(
                        f"cols spark={list(got0.columns)} duck={list(want0.columns)}")
                else:
                    gd = {c: str(got0[c].dtype) for c in got0.columns}
                    wd = {c: str(want0[c].dtype) for c in want0.columns}
                    if gd != wd:
                        problems.append(f"dtypes spark={gd} duck={wd}")
                if not problems:
                    sel = ", ".join(f'"{c}"' for c in got0.columns)
                    ng, nw, nd = con.execute(
                        f"SELECT (SELECT count(*) FROM {sp}),"
                        f" (SELECT count(*) FROM _want),"
                        f" (SELECT count(*) FROM ("
                        f"  (SELECT {sel} FROM {sp} EXCEPT ALL"
                        f"   SELECT {sel} FROM _want)"
                        f"  UNION ALL"
                        f"  (SELECT {sel} FROM _want EXCEPT ALL"
                        f"   SELECT {sel} FROM {sp})))").fetchone()
                    if ng != nw:
                        problems.append(f"rows spark={ng} duck={nw}")
                    elif nd != 0:
                        problems.append(f"{nd} rows differ (multiset)")
                if problems:
                    print(f"FAIL {name}: " + " | ".join(problems))
                    n_fail += 1
                else:
                    print(f"PASS {name} ({ng} rows, fast)")
                    n_pass += 1
                continue
            got = pd.read_parquet(spark_path)
            want = con.execute(sql).df()
        except Exception as e:
            if timed_out.is_set():
                print(f"TIMEOUT {name}: oracle exceeded {timeout:.0f}s")
                n_timeout += 1
            else:
                print(f"FAIL {name}: {e}")
                n_fail += 1
            continue
        finally:
            if timer is not None:
                timer.cancel()
            if timeout is not None:
                dt = time.monotonic() - t0
                if dt > timeout / 2:
                    print(f"  (slow oracle {name}: {dt:.0f}s)")
        got, want = canon(got), canon(want)
        problems = []
        if list(got.columns) != list(want.columns):
            problems.append(f"cols spark={list(got.columns)} duck={list(want.columns)}")
        if len(got) != len(want):
            problems.append(f"rows spark={len(got)} duck={len(want)}")
        if not problems:
            gd = {c: str(got[c].dtype) for c in got.columns}
            wd = {c: str(want[c].dtype) for c in want.columns}
            if gd != wd:
                problems.append(f"dtypes spark={gd} duck={wd}")
        if not problems and rows_key(got) != rows_key(want):
            gk, wk = rows_key(got), rows_key(want)
            diff = [i for i, (a, b) in enumerate(zip(gk, wk)) if a != b][:3]
            problems.append(f"values differ at sorted idx {diff}; "
                            f"ex spark={gk[diff[0]] if diff else '?'} "
                            f"duck={wk[diff[0]] if diff else '?'}")
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    if n_timeout:
        print(f"== {n_pass} pass, {n_fail} fail, {n_timeout} timeout ==")
    else:
        print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
