#!/usr/bin/env python3
"""Fit per-query scaling exponents from bench runs at several SFs. NOT part
of the shipped engine — dev tooling only.

Input: JSON files produced by `SPARK_GRAFT_BENCH_ONLY=... graft.Bench`
(one per SF), passed as  sf_rows:path  pairs, e.g.

  python3 tools/scale_fit.py 6000:/tmp/s001.json 60000:/tmp/s01.json \
      600000:/tmp/s1.json

Output: per-query fitted exponent a in t ~ N^a (log-log least squares),
with the time at each point. a <= ~1.1 reads as linear; sub-linear values
are dominated by fixed per-query overhead (job submission, planning) at
these sizes.
"""
import json
import math
import sys

runs = []  # (n_rows, {query: sec})
for arg in sys.argv[1:]:
    n, path = arg.split(":", 1)
    with open(path) as f:
        d = json.load(f)
    runs.append((float(n), d["queries"]))
runs.sort()

names = sorted(set.intersection(*(set(q) for _, q in runs)))
print(f"{'query':34s} " +
      " ".join(f"{int(n):>9d}" for n, _ in runs) + "   exponent")
for name in names:
    pts = [(n, q[name]) for n, q in runs if q.get(name, -1) > 0]
    if len(pts) < 2:
        continue
    xs = [math.log(n) for n, _ in pts]
    ys = [math.log(t) for _, t in pts]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    a = (sum((x - mx) * (y - my) for x, y in zip(xs, ys)) /
         sum((x - mx) ** 2 for x in xs))
    times = " ".join(f"{t:9.3f}" for _, t in pts)
    print(f"{name:34s} {times}   {a:6.2f}")
