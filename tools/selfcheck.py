#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus `oracle_sql.json`,
runs each oracle SQL in DuckDB over the same scale-factor parquet tables,
and compares: schema (column names + dtypes), row count, and an
order-insensitive exact value comparison.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [nameFilter] [timeoutSec] [mode]

  nameFilter: comma-separated query names ("-" = all, the default).
      A name that matches no oracle is an ERROR (nonzero exit), so a
      typo'd gate invocation cannot silently report "0 pass, 0 fail".
  timeoutSec: per-oracle wall budget; a DuckDB run past it is interrupted.
      Before reporting TIMEOUT the sweep escalates through a retry
      ladder, each rung mechanizing a class of manual adjudication:
      (1) BRANCH BY BRANCH — top-level UNION ALL arms are materialized
      one at a time into temp tables (each arm under its own budget,
      the shared WITH prefix carried into every arm — DuckDB only
      evaluates the CTEs an arm references), then the compare runs
      against the union of the materialized arms. This cracks the
      instrument-composition oracles (p90 at sf1.0, p102's 12 branches
      at sf10), whose multi-branch UNION plans trip DuckDB's scheduler
      at scale-rung volumes. An oracle with no top-level UNION ALL is
      retried once whole under 4x the budget.
      (2) CTE BY CTE — if a single arm (or the whole-query retry) still
      trips, the WITH block is materialized one CTE at a time into temp
      tables (each under 4x budget; DuckDB resolves the stripped body's
      references to the temp tables, which shadow same-named views the
      way the CTEs did), then the body runs — whole, or branch-split if
      it still trips. This cracks the kmeans-chain family (p100/p110/
      p117/p123/p125 at sf10): their N*K assignment CTE is a nested-loop
      DuckDB cannot finish inside one whole-query window, but CTAS'd
      alone it gets its own window AND is paid once instead of once per
      consuming UNION branch.
      Only an oracle that STILL exceeds a rung's budget is reported
      TIMEOUT (counted separately from FAIL; exit stays 0 if all else
      passes), naming the CTE/branch that tripped.
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

Every oracle runs on its own cursor (duckdb per-cursor connection), so
an interrupt that fires as an oracle finishes lands on THIS oracle's
cursor, never the next oracle's — a stale interrupt flag cannot turn a
fresh query into a spurious FAIL.
"""
import json
import math
import re
import sys
import threading
import time
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


class OracleTimeout(Exception):
    def __init__(self, what):
        self.what = what


class Budget:
    """Arm an interrupt timer around ONE DuckDB statement on `cur`.

    The done-flag is set before timer.cancel(), so a timer that fires in
    the cancellation window sees done and does NOT interrupt; and the
    interrupt targets this oracle's own cursor, so even the residual
    fire-vs-set race cannot leak into another oracle.
    """

    def __init__(self, cur, seconds, what):
        self.cur, self.seconds, self.what = cur, seconds, what
        self.timed_out = threading.Event()
        self.done = threading.Event()
        self.timer = None

    def __enter__(self):
        if self.seconds is not None:
            def kill():
                if not self.done.is_set():
                    self.timed_out.set()
                    self.cur.interrupt()
            self.timer = threading.Timer(self.seconds, kill)
            self.timer.start()
        return self

    def __exit__(self, etype, evalue, tb):
        self.done.set()
        if self.timer is not None:
            self.timer.cancel()
            # if kill() is mid-flight (passed the done check, interrupt
            # not yet delivered), wait for it so timed_out is decisive
            self.timer.join()
        if self.timed_out.is_set():
            if etype is not None:
                raise OracleTimeout(self.what)
            # The statement finished in the fire-vs-set window: the
            # interrupt landed on an IDLE cursor and the stale flag
            # would abort the NEXT statement (misreporting a healthy
            # oracle as FAIL). Drain it on a trivial statement.
            try:
                self.cur.execute("SELECT 1")
            except duckdb.InterruptException:
                pass
        return False


def scan_sql(sql):
    """One pass over `sql` recording, per character position, the paren
    DEPTH and whether the position is inside a single-quoted string
    (with '' escape), a double-quoted identifier (with "" escape), a
    `--` line comment, or a `/* */` block comment. Returns
    (depth, opaque) arrays — a position with opaque[i] True must not be
    treated as SQL structure."""
    n = len(sql)
    depth = [0] * n
    opaque = [False] * n
    d = 0
    i = 0
    mode = None  # None | "'" | '"' | '--' | '/*'
    while i < n:
        c = sql[i]
        if mode == "'" or mode == '"':
            opaque[i] = True
            if c == mode:
                if i + 1 < n and sql[i + 1] == mode:  # doubled escape
                    opaque[i + 1] = True
                    depth[i] = depth[i + 1] = d
                    i += 2
                    continue
                mode = None
        elif mode == "--":
            opaque[i] = True
            if c == "\n":
                mode = None
                opaque[i] = False
        elif mode == "/*":
            opaque[i] = True
            if c == "*" and i + 1 < n and sql[i + 1] == "/":
                opaque[i + 1] = True
                depth[i] = depth[i + 1] = d
                i += 2
                mode = None
                continue
        elif c == "'" or c == '"':
            mode = c
            opaque[i] = True
        elif c == "-" and i + 1 < n and sql[i + 1] == "-":
            mode = "--"
            opaque[i] = True
        elif c == "/" and i + 1 < n and sql[i + 1] == "*":
            mode = "/*"
            opaque[i] = True
        elif c == "(":
            d += 1
        elif c == ")":
            d -= 1
        depth[i] = d
        i += 1
    return depth, opaque


def split_with_prefix(sql):
    """Split a leading WITH block off `sql`. Returns
    (ctes, body_start) where ctes is a list of (name, inner_sql) and
    body_start the offset of the main body — or None on no WITH, on
    WITH RECURSIVE (a recursive CTE cannot be CTAS'd independently),
    or on any parse trouble."""
    n = len(sql)
    depth, opaque = scan_sql(sql)
    if re.match(r"\s*WITH\s+RECURSIVE\b", sql, re.IGNORECASE):
        return None
    m = re.match(r"\s*WITH\b", sql, re.IGNORECASE)
    if not m:
        return None
    pos = m.end()
    ctes = []
    while True:
        # CTE head: name [ (cols) ] AS (
        h = re.match(r'\s*("(?:[^"]|"")+"|[A-Za-z_][A-Za-z_0-9]*)',
                     sql[pos:])
        if not h:
            return None
        name = h.group(1)
        if name.startswith('"'):
            name = name[1:-1].replace('""', '"')
        pos += h.end()
        op = sql.find("(", pos)
        if op < 0:
            return None
        between = sql[pos:op]
        if re.search(r"\bAS\s*$", between, re.IGNORECASE) is None:
            # a (cols) list before AS — unsupported shape, give up
            return None
        d0 = depth[op]
        close = None
        for j in range(op + 1, n):
            if sql[j] == ")" and not opaque[j] and depth[j] == d0 - 1:
                close = j
                break
        if close is None:
            return None
        ctes.append((name, sql[op + 1:close].strip()))
        pos = close + 1
        rest = re.match(r"\s*,", sql[pos:])
        if rest:
            pos += rest.end()
        else:
            break
    return ctes, pos


def split_union_all(sql):
    """Split `sql` into (with_prefix, [branch bodies]) on top-level
    UNION ALL, or None if there is no top-level UNION ALL.

    with_prefix is the leading WITH CTE block (possibly empty), carried
    verbatim into every branch — DuckDB evaluates only the CTEs a
    branch actually references."""
    body_start = 0
    parsed = split_with_prefix(sql)
    if parsed is not None:
        _, body_start = parsed
    elif re.match(r"\s*WITH\b", sql, re.IGNORECASE):
        return None  # has a WITH block we failed to parse; don't mis-split
    prefix = sql[:body_start]
    body = sql[body_start:]
    depth, opaque = scan_sql(sql)
    cuts = []
    for mm in re.finditer(r"\bUNION\s+ALL\b", body, re.IGNORECASE):
        p = body_start + mm.start()
        if depth[p] == 0 and not opaque[p]:
            cuts.append((mm.start(), mm.end()))
    if not cuts:
        return None
    branches = []
    prev = 0
    for s0, e0 in cuts:
        branches.append(body[prev:s0])
        prev = e0
    branches.append(body[prev:])
    return prefix, [b.strip() for b in branches]


def materialize_ctes(cur, sql, timeout, name):
    """Ladder rung 2 (the kmeans-chain mechanization): materialize the
    WITH block one CTE at a time into temp tables (each under 4x
    budget; the stripped body's references then resolve to the temp
    tables, which shadow same-named views exactly the way the CTEs
    did), then CTAS the body — whole, or branch-split if it still
    trips. The heavy assignment CTE gets its own budget window AND is
    paid once, not once per consuming UNION branch.
    Raises OracleTimeout if a single CTE/branch still exceeds its
    window, or if the WITH block cannot be split."""
    parsed = split_with_prefix(sql)
    if parsed is None:
        raise OracleTimeout(f"{name} (and no splittable WITH block for "
                            f"a CTE-by-CTE retry)")
    ctes, body_start = parsed
    per = timeout * 4 if timeout else None
    try:
        for i, (cname, cbody) in enumerate(ctes):
            with Budget(cur, per,
                        f"{name} CTE {cname} ({i + 1}/{len(ctes)})"):
                cur.execute(
                    f'CREATE OR REPLACE TEMP TABLE "{cname}" AS ({cbody})')
    except OracleTimeout:
        raise
    except Exception as e:
        # a CTE the splitter mis-parsed binds badly; the honest status
        # is still "exceeded budget, mechanized retries failed"
        raise OracleTimeout(f"{name} (CTE split failed: "
                            f"{type(e).__name__}: {e})")
    body = sql[body_start:]
    try:
        with Budget(cur, per, f"{name} body after CTE materialization"):
            cur.execute(f"CREATE OR REPLACE TEMP TABLE _body AS ({body})")
        print(f"  (oracle {name}: materialized {len(ctes)} CTEs under "
              f"per-CTE budget, then the body whole)")
        return "_body"
    except OracleTimeout:
        parts = split_union_all(body)
        if parts is None:
            raise
        _, branches = parts
        for i, b in enumerate(branches):
            with Budget(cur, per,
                        f"{name} body branch {i + 1}/{len(branches)} "
                        f"after CTE materialization"):
                cur.execute(f"CREATE OR REPLACE TEMP TABLE _b{i} AS ({b})")
        print(f"  (oracle {name}: materialized {len(ctes)} CTEs + "
              f"{len(branches)} body branches under per-step budget)")
        union = " UNION ALL ".join(
            f"SELECT * FROM _b{i}" for i in range(len(branches)))
        return f"({union})"


def materialize_oracle(cur, sql, timeout, name):
    """Escalating retry ladder after a whole-oracle budget trip:
    (1) top-level UNION ALL arms one at a time (or a whole-query 4x
    retry when there is no union), then (2) CTE-by-CTE materialization.
    Returns a FROM-able SQL expression for the oracle result; raises
    OracleTimeout only when every rung trips."""
    parts = split_union_all(sql)
    if parts is None:
        try:
            with Budget(cur, timeout * 4 if timeout else None,
                        f"{name} retry at 4x budget"):
                cur.execute(f"CREATE OR REPLACE TEMP TABLE _b0 AS ({sql})")
            print(f"  (oracle {name}: passed on whole-query retry "
                  f"at 4x budget)")
            return "_b0"
        except OracleTimeout:
            return materialize_ctes(cur, sql, timeout, name)
    prefix, branches = parts
    try:
        for i, b in enumerate(branches):
            stmt = f"CREATE OR REPLACE TEMP TABLE _b{i} AS ({prefix} {b})"
            with Budget(cur, timeout,
                        f"{name} branch {i + 1}/{len(branches)}"):
                cur.execute(stmt)
    except OracleTimeout:
        return materialize_ctes(cur, sql, timeout, name)
    except Exception as e:
        # a mis-split branch (the splitter is a scanner, not a parser)
        # surfaces as a binder/parse error on bogus branch SQL — fall
        # back to the whole query under 4x budget instead of letting it
        # read as a spurious oracle FAIL
        print(f"  (oracle {name}: branch split bound badly "
              f"({type(e).__name__}); whole-query retry at 4x budget)")
        with Budget(cur, timeout * 4 if timeout else None,
                    f"{name} retry at 4x budget"):
            cur.execute(f"CREATE OR REPLACE TEMP TABLE _b0 AS ({sql})")
        return "_b0"
    print(f"  (oracle {name}: materialized {len(branches)} UNION ALL "
          f"branches under per-branch budget)")
    union = " UNION ALL ".join(
        f"SELECT * FROM _b{i}" for i in range(len(branches)))
    return f"({union})"


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


def compare_fast(cur, name, spark_rel, want_rel, timeout):
    """Schema + count + engine-side multiset compare. `want_rel` is a
    FROM-able SQL expression for the ALREADY-MATERIALIZED oracle result.

    One simple statement per Budget: DuckDB 1.0 does not honor
    interrupt() inside a statement whose uncorrelated scalar subqueries
    carry the work (measured: a 3-scalar-subquery compare ran 30 s
    through a 3 s interrupt; a bare count / CTAS aborts on time), so the
    compare never packs the heavy relations into scalar subqueries."""
    got0 = cur.execute(f"SELECT * FROM {spark_rel} LIMIT 0").df()
    want0 = cur.execute(f"SELECT * FROM {want_rel} LIMIT 0").df()
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
    ng = None
    if not problems:
        sel = ", ".join(f'"{c}"' for c in got0.columns)
        with Budget(cur, timeout, f"{name} count spark"):
            ng = cur.execute(
                f"SELECT count(*) FROM {spark_rel}").fetchone()[0]
        with Budget(cur, timeout, f"{name} count oracle"):
            nw = cur.execute(
                f"SELECT count(*) FROM {want_rel}").fetchone()[0]
        if ng != nw:
            problems.append(f"rows spark={ng} duck={nw}")
        else:
            with Budget(cur, timeout, f"{name} multiset compare"):
                nd = cur.execute(
                    f"SELECT count(*) FROM ("
                    f"  (SELECT {sel} FROM {spark_rel} EXCEPT ALL"
                    f"   SELECT {sel} FROM {want_rel})"
                    f"  UNION ALL"
                    f"  (SELECT {sel} FROM {want_rel} EXCEPT ALL"
                    f"   SELECT {sel} FROM {spark_rel}))").fetchone()[0]
            if nd != 0:
                problems.append(f"{nd} rows differ (multiset)")
    return problems, ng


def compare_rowkey(got, want):
    got, want = canon(got), canon(want)
    problems = []
    if list(got.columns) != list(want.columns):
        problems.append(
            f"cols spark={list(got.columns)} duck={list(want.columns)}")
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
    return problems, len(got)


def run_one(cur, name, sql, spark_path, timeout, fast):
    """Returns ('pass'|'fail'|'timeout', detail)."""
    spark_rel = (f"read_parquet('{spark_path}/*.parquet')"
                 if Path(spark_path).is_dir()
                 else f"read_parquet('{spark_path}')")
    t0 = time.monotonic()
    try:
        if fast:
            # materialize the oracle ONCE (CTAS is interruptible, and the
            # compare then reads the materialized rows instead of
            # re-running the oracle for each of count + 2x EXCEPT)
            try:
                with Budget(cur, timeout, f"{name} oracle"):
                    cur.execute(
                        f"CREATE OR REPLACE TEMP TABLE _want AS ({sql})")
                want_rel = "_want"
            except OracleTimeout:
                want_rel = materialize_oracle(cur, sql, timeout, name)
            problems, ng = compare_fast(
                cur, name, spark_rel, want_rel, timeout)
            return (("fail", " | ".join(problems)) if problems
                    else ("pass", f"{ng} rows, fast"))
        # rowkey mode: the parquet read is NOT under the oracle budget
        # (the budget protects against runaway DuckDB plans; a slow read
        # must not eat the window the execute needs).
        got = pd.read_parquet(spark_path)
        try:
            with Budget(cur, timeout, f"{name} oracle"):
                want = cur.execute(sql).df()
        except OracleTimeout:
            want_rel = materialize_oracle(cur, sql, timeout, name)
            with Budget(cur, timeout, f"{name} fetch after branch split"):
                want = cur.execute(f"SELECT * FROM {want_rel}").df()
        problems, nrows = compare_rowkey(got, want)
        return (("fail", " | ".join(problems)) if problems
                else ("pass", f"{nrows} rows"))
    except OracleTimeout as t:
        return ("timeout", f"exceeded budget at: {t.what}")
    finally:
        if timeout is not None:
            dt = time.monotonic() - t0
            if dt > timeout / 2:
                print(f"  (slow oracle {name}: {dt:.0f}s)")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # Bound the spill: at sf10 one instrument oracle's CTAS spilled the
    # disk FULL (>70 GB of duckdb_temp_storage), killing not just its
    # own sweep but every concurrently-running Spark JVM on the host.
    # With a cap the runaway oracle aborts alone and is reported FAIL.
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET max_temp_directory_size='30GiB'")
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
        unknown = only - set(oracles)
        if unknown:
            print(f"ERROR: nameFilter entries match no oracle: "
                  f"{sorted(unknown)}")
            sys.exit(2)
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
        cur = con.cursor()  # oracle-scoped: stale interrupts cannot leak
        try:
            status, detail = run_one(cur, name, sql, spark_path,
                                     timeout, fast)
        except Exception as e:  # engine error (spill cap, binder, IO):
            status, detail = "fail", f"{type(e).__name__}: {e}"
        finally:
            cur.close()
        if status == "pass":
            print(f"PASS {name} ({detail})")
            n_pass += 1
        elif status == "timeout":
            print(f"TIMEOUT {name}: {detail}")
            n_timeout += 1
        else:
            print(f"FAIL {name}: {detail}")
            n_fail += 1
    if n_timeout:
        print(f"== {n_pass} pass, {n_fail} fail, {n_timeout} timeout ==")
    else:
        print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
