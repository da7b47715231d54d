#!/usr/bin/env python3
"""Derive a two-decades-up DEDUP corpus (sf10-class, ~500k docs) from the
sf0.1 documents table (VERDICT r19 #4: one scale leg past sf1 for the
dedup/corpus path, measuring the bucket-cap overflow counters the code
predicts widen past ~100k docs/shard).

Same replication rule as dev/make_sf1.py documents: 100 shifted copies,
every token suffixed with its copy index — WITHIN-copy near-dup structure
(shingles, Jaccard, simhash bands) preserved exactly, NO cross-copy
near-duplicates, so pair density scales linearly (100x docs, 100x true
pairs), not quadratically. Only the documents table is written — the
scale-leg queries (d_minhash_lsh, d_simhash_pairs, d_corpus_build) read
nothing else.

Usage: python3 dev/make_sf10.py [outDir]   (default target/sf10)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "target/sf10"
COPIES = 100

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
doc_off = con.execute(
    f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'").fetchone()[0]
con.execute(f"""COPY (
  WITH rewritten AS (
    SELECT d.doc_id + t.i * {doc_off} AS doc_id,
           regexp_replace(d.text, '(\\S+)', '\\1' || t.i, 'g') AS text,
           d.lang, d.source
    FROM '{SRC}/documents.parquet' d, range({COPIES}) t(i))
  SELECT doc_id, text, lang, source, CAST(len(text) AS BIGINT) AS n_chars
  FROM rewritten
  ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")
n = con.execute(f"SELECT count(*) FROM '{OUT}/documents.parquet'").fetchone()[0]
print(f"documents: {n} rows -> {OUT}")
