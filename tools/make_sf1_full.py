#!/usr/bin/env python3
"""Extend the synthesized ~sf1 dir to ALL ten tables so the FULL query
suite gets its third scale point (round-10 verdict item 1). NOT part of
the shipped engine — dev tooling only.

TPC-H-ish tables are 10 disjoint-key copies of sf0.1: copy k shifts every
entity key by k * (max_key + 1) consistently across fact/dimension FKs,
so join fan-outs and group counts scale linearly (keys never collide
across copies, each copy is an internally consistent mini-warehouse).
region/nation stay verbatim (fixed dimensions — the real TPC-H contract).
documents/embeddings come from make_sf1.py (token-replaced copies) and
events from the round-12 events synthesis (disjoint-user copies); this
script generates any of those that are missing using the same recipes.

Usage: python3 tools/make_sf1_full.py [outdir]   (default /tmp/sfscale/sf1)
"""
import subprocess
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf1")
OUT.mkdir(parents=True, exist_ok=True)
COPIES = 10

con = duckdb.connect()


def copy_verbatim(table):
    con.execute(f"""
        COPY (SELECT * FROM '{SRC}/{table}.parquet')
        TO '{OUT}/{table}.parquet' (FORMAT PARQUET)""")
    print(f"{table}: verbatim")


def key_span(table, col):
    return con.execute(
        f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]


KC = key_span("customer", "c_custkey")
KS = key_span("supplier", "s_suppkey")
KP = key_span("part", "p_partkey")
KO = key_span("orders", "o_orderkey")

copies = f"(SELECT unnest(range({COPIES})) AS k)"

copy_verbatim("region")
copy_verbatim("nation")

con.execute(f"""
    COPY (SELECT c_custkey + k * {KC} AS c_custkey, c_name, c_nationkey,
                 c_acctbal, c_mktsegment
          FROM '{SRC}/customer.parquet' CROSS JOIN {copies}
          ORDER BY c_custkey)
    TO '{OUT}/customer.parquet' (FORMAT PARQUET)""")
print("customer: x10")

con.execute(f"""
    COPY (SELECT s_suppkey + k * {KS} AS s_suppkey, s_name, s_nationkey,
                 s_acctbal
          FROM '{SRC}/supplier.parquet' CROSS JOIN {copies}
          ORDER BY s_suppkey)
    TO '{OUT}/supplier.parquet' (FORMAT PARQUET)""")
print("supplier: x10")

con.execute(f"""
    COPY (SELECT p_partkey + k * {KP} AS p_partkey, p_name, p_brand, p_type,
                 p_size, p_retailprice
          FROM '{SRC}/part.parquet' CROSS JOIN {copies}
          ORDER BY p_partkey)
    TO '{OUT}/part.parquet' (FORMAT PARQUET)""")
print("part: x10")

con.execute(f"""
    COPY (SELECT o_orderkey + k * {KO} AS o_orderkey,
                 o_custkey + k * {KC} AS o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM '{SRC}/orders.parquet' CROSS JOIN {copies}
          ORDER BY o_orderkey)
    TO '{OUT}/orders.parquet' (FORMAT PARQUET)""")
print("orders: x10")

con.execute(f"""
    COPY (SELECT l_orderkey + k * {KO} AS l_orderkey,
                 l_partkey + k * {KP} AS l_partkey,
                 l_suppkey + k * {KS} AS l_suppkey,
                 l_linenumber, l_quantity, l_extendedprice, l_discount,
                 l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM '{SRC}/lineitem.parquet' CROSS JOIN {copies}
          ORDER BY l_orderkey, l_linenumber)
    TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)""")
print("lineitem: x10")

if not (OUT / "documents.parquet").exists() or not (OUT / "embeddings.parquet").exists():
    subprocess.run([sys.executable,
                    str(Path(__file__).parent / "make_sf1.py"), str(OUT)],
                   check=True)
    print("documents/embeddings: via make_sf1.py")
else:
    print("documents/embeddings: already present")

if not (OUT / "events.parquet").exists():
    # round-12 events recipe: 10 disjoint-user copies (ids and event ids
    # shifted per copy; timestamps unchanged so window populations scale)
    KU = con.execute(
        f"SELECT max(user_id) + 1 FROM '{SRC}/events.parquet'").fetchone()[0]
    KE = con.execute(
        f"SELECT max(event_id) + 1 FROM '{SRC}/events.parquet'").fetchone()[0]
    con.execute(f"""
        COPY (SELECT event_id + k * {KE} AS event_id, ts,
                     user_id + k * {KU} AS user_id, event_type, value, props
              FROM '{SRC}/events.parquet' CROSS JOIN {copies}
              ORDER BY event_id)
        TO '{OUT}/events.parquet' (FORMAT PARQUET)""")
    print("events: x10")
else:
    print("events: already present")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"  {t}: {n} rows")
