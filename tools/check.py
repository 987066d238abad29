#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate.

Runs each oracle SQL from Verify's oracle_sql.json in DuckDB over the sf
parquet tables and compares against the parquet Verify wrote for the same
query. NOT part of the shipped engine — dev tooling only.

Usage: python3 tools/check.py [sfdir] [verify_out]
"""
import json
import math
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


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = OUT / name
        if not qdir.exists():
            print(f"FAIL {name}: no Verify output")
            n_fail += 1
            continue
        try:
            gcols, got = table(con, f"SELECT * FROM '{qdir}/*.parquet'")
            ecols, exp = table(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got, exp)):
            if g != e:
                bad = (i, g, e)
                break
        if bad:
            i, g, e = bad
            print(f"FAIL {name}: first diff row {i}:\n  got {g}\n  exp {e}")
            # float drift diagnostics
            for a, b in zip(g, e):
                if isinstance(a, float) and isinstance(b, float) and a != b:
                    print(f"    float drift: {a!r} vs {b!r} (delta {a - b:.3e})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    missing = [q for q in (d.name for d in OUT.iterdir() if d.is_dir())
               if q not in oracle]
    if missing:
        print(f"note: queries with no oracle (rows-only check): {sorted(missing)}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
