#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate.

Runs each oracle SQL from Verify's oracle_sql.json in DuckDB over the sf
parquet tables and compares against the parquet Verify wrote for the same
query. NOT part of the shipped engine — dev tooling only.

Usage: python3 tools/check.py [sfdir] [verify_out]
Env:   CHECK_TIMEOUT=<secs>  run each oracle in its own process with a
       wall-clock cap (for the synthesized-sf1 sweep, where a handful of
       deliberately quadratic oracles — e.g. the recursive-CTE closure —
       may not complete); timed-out queries report TIMEOUT, not FAIL.
       CHECK_ONLY=q_a,q_b    restrict to named queries.
"""
import json
import math
import multiprocessing as mp
import os
import sys
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def table(con, sql):
    rows = con.execute(sql).fetchall()
    cols = [d[0] for d in con.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple(str(x) for x in r))


def connect():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def check_one(con, name, sql):
    """Compare one query; returns (status_line, passed)."""
    qdir = OUT / name
    if not qdir.exists():
        return f"FAIL {name}: no Verify output", False
    try:
        gcols, got = table(con, f"SELECT * FROM '{qdir}/*.parquet'")
        ecols, exp = table(con, sql)
    except Exception as e:
        return f"FAIL {name}: {e}", False
    if gcols != ecols:
        return f"FAIL {name}: columns {gcols} != {ecols}", False
    if len(got) != len(exp):
        return f"FAIL {name}: rows {len(got)} != {len(exp)}", False
    for i, (g, e) in enumerate(zip(got, exp)):
        if g != e:
            lines = [f"FAIL {name}: first diff row {i}:\n  got {g}\n  exp {e}"]
            for a, b in zip(g, e):
                if isinstance(a, float) and isinstance(b, float) and a != b:
                    lines.append(f"    float drift: {a!r} vs {b!r} (delta {a - b:.3e})")
            return "\n".join(lines), False
    return f"PASS {name} ({len(got)} rows)", True


def _worker(name, sql, q):
    con = connect()
    q.put(check_one(con, name, sql))


def main():
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    only = os.environ.get("CHECK_ONLY")
    if only:
        keep = set(only.split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    timeout = float(os.environ.get("CHECK_TIMEOUT", "0"))
    n_pass = n_fail = n_timeout = 0
    con = None if timeout > 0 else connect()
    for name in sorted(oracle):
        if timeout > 0:
            q = mp.Queue()
            p = mp.Process(target=_worker, args=(name, oracle[name], q))
            p.start()
            p.join(timeout)
            if p.is_alive():
                p.terminate()
                p.join()
                print(f"TIMEOUT {name} (> {timeout:.0f}s)")
                n_timeout += 1
                continue
            line, ok = q.get() if not q.empty() else (f"FAIL {name}: worker died", False)
        else:
            line, ok = check_one(con, name, oracle[name])
        print(line)
        if ok:
            n_pass += 1
        else:
            n_fail += 1
    missing = [] if only else [
        q for q in (d.name for d in OUT.iterdir() if d.is_dir())
        if q not in oracle]
    if missing:
        print(f"note: queries with no oracle (rows-only check): {sorted(missing)}")
    tmo = f", {n_timeout} timeout" if n_timeout else ""
    print(f"== {n_pass} pass, {n_fail} fail{tmo} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()


