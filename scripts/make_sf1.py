#!/usr/bin/env python3
"""Derive a 10x scaling replica of the driver's sf0.1 testdata for the
SCALE.md measurement appendix (dev tooling only — never an oracle
input).

Shape: documents/embeddings become 10 shards; shard r shifts every id
by r*STRIDE and prefixes every word with "r<r>" so shards share no
shingles/vocab — the corpus is 10 independent sf0.1 corpora, i.e. 10x
the rows with per-shard structure (near-dup families, df selectivity,
vocabulary relationships) exactly preserved. The remaining tables are
copied through unchanged (the spot-checked queries read only
documents/embeddings).

Usage: python3 scripts/make_sf1.py <src> <dst> [replicas=10]
"""
import sys, shutil, os
import duckdb

src, dst = sys.argv[1], sys.argv[2]
os.makedirs(dst, exist_ok=True)
STRIDE = 10_000_000
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

con = duckdb.connect()

docs = " UNION ALL ".join(
    f"""SELECT doc_id + {r * STRIDE} AS doc_id,
               array_to_string(list_transform(string_split(text, ' '),
                 w -> CASE WHEN w = '' THEN '' ELSE 'r{r}' || w END), ' ') AS text,
               lang, source, n_chars
        FROM read_parquet('{src}/documents.parquet')"""
    for r in range(REPLICAS))
con.sql(f"COPY ({docs}) TO '{dst}/documents.parquet' (FORMAT PARQUET)")

emb_cols = [r[0] for r in con.sql(
    f"DESCRIBE SELECT * FROM read_parquet('{src}/embeddings.parquet')").fetchall()]
rest = ", ".join(c for c in emb_cols if c != "vec_id")
embs = " UNION ALL ".join(
    f"SELECT vec_id + {r * STRIDE} AS vec_id, {rest} "
    f"FROM read_parquet('{src}/embeddings.parquet')"
    for r in range(REPLICAS))
con.sql(f"COPY ({embs}) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")

for t in ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events"):
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

print("wrote", dst)
