#!/usr/bin/env python3
"""Synthesize a ~sf1 documents/embeddings pair (10x sf0.1) for the scale
sweep. NOT part of the shipped engine — dev tooling only (the driver owns
real testdata generation; this approximates the next decade up).

Design constraints, so scaling exponents stay meaningful:
- 10 copies of every sf0.1 doc with doc_id shifted per copy;
- each copy k > 0 deterministically REPLACES ~30% of tokens (hash-picked
  positions, hash-picked vocabulary replacements). SimHash is a bag-of-
  tokens signature, so verbatim copies (or mere reorderings) would put
  every doc within 0-3 bits of its 9 siblings and near-dup pair counts
  would grow quadratically in the copy factor — an input-distribution artifact,
  not an engine property. 30% replacement pushes cross-copy Hamming well
  past the band radius while keeping the within-copy duplicate structure
  of the original corpus, so pair counts stay ~linear in corpus size.
- embeddings: 10 copies with deterministic per-dimension jitter (±0.05),
  same rationale in cosine space.

Usage: python3 tools/make_sf1.py [outdir]   (default /tmp/sfscale/sf1)
"""
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf1")
OUT.mkdir(parents=True, exist_ok=True)
COPIES = 10

con = duckdb.connect()
con.execute(f"CREATE VIEW base AS SELECT * FROM '{SRC}/documents.parquet'")
con.execute(f"CREATE VIEW emb AS SELECT * FROM '{SRC}/embeddings.parquet'")

con.execute("""
CREATE TABLE vocab AS
SELECT list(term ORDER BY term) AS terms, count(*) AS v FROM (
  SELECT DISTINCT unnest(str_split(text, ' ')) AS term FROM base
  WHERE length(text) > 0)
""")

shift = con.execute("SELECT max(doc_id) + 1 FROM base").fetchone()[0]
con.execute(f"""
COPY (
  SELECT d.doc_id + k.k * {shift} AS doc_id,
    CASE WHEN k.k = 0 THEN d.text ELSE
      array_to_string(
        list_transform(str_split(d.text, ' '), (t, i) ->
          CASE WHEN hash(d.doc_id * 1000003 + k.k * 8191 + i) % 10 < 3
               THEN v.terms[CAST(1 + hash(d.doc_id * 31 + k.k * 7 + i) % v.v AS BIGINT)]
               ELSE t END), ' ')
    END AS text,
    d.lang, d.source, d.n_chars
  FROM base d
  CROSS JOIN (SELECT unnest(range({COPIES})) AS k) k
  CROSS JOIN vocab v
) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
""")

vshift = con.execute("SELECT max(vec_id) + 1 FROM emb").fetchone()[0]
con.execute(f"""
COPY (
  SELECT e.vec_id + k.k * {vshift} AS vec_id,
    CASE WHEN k.k = 0 THEN e.embedding ELSE
      list_transform(e.embedding, (x, i) -> CAST(
        x + (CAST(hash(e.vec_id * 131071 + k.k * 37 + i) % 2001 AS DOUBLE)
             - 1000.0) / 20000.0 AS FLOAT))
    END AS embedding,
    e.label
  FROM emb e
  CROSS JOIN (SELECT unnest(range({COPIES})) AS k) k
) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
""")

for t in ("documents", "embeddings"):
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows -> {OUT}/{t}.parquet")
