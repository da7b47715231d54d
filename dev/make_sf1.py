#!/usr/bin/env python3
"""Derive a one-decade-up perf corpus (sf1) from the sf0.1 fixtures.

VERDICT r11 #7 asks for an sf1.0 spot-sweep of the >=2 s queries; the
driver ships sf{0.001,0.01,0.1} only, so this builds a DERIVED corpus
under target/sf1 (never under /root/testdata): each scaled table is 10
shifted copies of its sf0.1 original.

Replication rules (chosen so the slow-query families see a REALISTIC
decade-up, not a pathological one):
  - documents: doc_id shifted per copy; every token gets a per-copy
    suffix, so WITHIN-copy similarity structure (shingles, Jaccard,
    simhash bands, adjacency) is preserved exactly while NO cross-copy
    near-duplicates exist -- a 10x corpus with the same pair density,
    not a 45x duplicate explosion.
  - lineitem/orders: orderkeys shifted in lockstep so the join keys
    still match within a copy; part/supplier/customer keys unshifted
    (10x lines per dimension row -- ordinary fact growth).
  - events: event_id/user_id shifted (distinct users scale too).
  - embeddings: vec_id shifted, vectors unchanged (NOTE: vector
    near-dup queries would see 10 exact twins per vector -- the v_*
    family is not in the slow set; do not read v_* timings off sf1).
  - dimension tables copied as-is.

Besides OUT, this also builds OUT + "slice" (default target/sf1slice):
identical except embeddings is the DETERMINISTIC SCOPED SLICE
`vec_id % vec_off < 200` — the first 200 base vectors of sf0.1 together
with ALL NINE of each one's sf1 twins (2,000 vectors total). The slice
keeps the sf1-specific structure (exact cross-copy twins) at a size
where the 17 Lloyd-replay/list-op v_* DuckDB oracles finish in seconds
(VERDICT r19 #2), so the whole family is sf1-oracle-green instead of
invariant-audited. Non-embeddings tables are symlinked to OUT's.

Usage: python3 dev/make_sf1.py [outDir]   (default target/sf1)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "target/sf1"
COPIES = 10
SLICE_BASE = 200  # base vectors kept per copy in the scoped slice

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def write(name: str, sql: str) -> None:
    dest = f"{OUT}/{name}.parquet"
    con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
    print(f"{name}: {n} rows")


def off(table: str, col: str) -> int:
    return con.execute(
        f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]


doc_off = off("documents", "doc_id")
write("documents", f"""
  WITH rewritten AS (
    SELECT d.doc_id + t.i * {doc_off} AS doc_id,
           regexp_replace(d.text, '(\\S+)', '\\1' || t.i, 'g') AS text,
           d.lang, d.source
    FROM '{SRC}/documents.parquet' d, range({COPIES}) t(i))
  -- n_chars recomputed: the suffix rewrite lengthens text, and a stale
  -- copied n_chars would make n_chars <> len(text) internally
  -- inconsistent on sf1 (ADVICE r12)
  SELECT doc_id, text, lang, source, CAST(len(text) AS BIGINT) AS n_chars
  FROM rewritten""")

vec_off = off("embeddings", "vec_id")
write("embeddings", f"""
  SELECT e.vec_id + t.i * {vec_off} AS vec_id, e.embedding, e.label
  FROM '{SRC}/embeddings.parquet' e, range({COPIES}) t(i)""")

ev_off = off("events", "event_id")
user_off = off("events", "user_id")
write("events", f"""
  SELECT e.event_id + t.i * {ev_off} AS event_id,
         e.ts + to_seconds(t.i) AS ts,
         e.user_id + t.i * {user_off} AS user_id,
         e.event_type, e.value, e.props
  FROM '{SRC}/events.parquet' e, range({COPIES}) t(i)""")

ord_off = off("orders", "o_orderkey")
write("orders", f"""
  SELECT o.o_orderkey + t.i * {ord_off} AS o_orderkey,
         o.* EXCLUDE (o_orderkey)
  FROM '{SRC}/orders.parquet' o, range({COPIES}) t(i)""")
write("lineitem", f"""
  SELECT l.l_orderkey + t.i * {ord_off} AS l_orderkey,
         l.* EXCLUDE (l_orderkey)
  FROM '{SRC}/lineitem.parquet' l, range({COPIES}) t(i)""")

for dim in ["customer", "supplier", "part", "nation", "region"]:
    write(dim, f"SELECT * FROM '{SRC}/{dim}.parquet'")

print(f"done -> {OUT}")

# --- the scoped v_* slice (see module doc) ---
SLICE = OUT + "slice"
os.makedirs(SLICE, exist_ok=True)
con.execute(f"""COPY (
  SELECT * FROM '{OUT}/embeddings.parquet'
  WHERE vec_id % {vec_off} < {SLICE_BASE}
  ) TO '{SLICE}/embeddings.parquet' (FORMAT PARQUET)""")
n = con.execute(
    f"SELECT count(*) FROM '{SLICE}/embeddings.parquet'").fetchone()[0]
assert n == SLICE_BASE * COPIES, n
print(f"embeddings slice: {n} rows ({SLICE_BASE} bases x {COPIES} twins)")
for t in ["documents", "events", "orders", "lineitem",
          "customer", "supplier", "part", "nation", "region"]:
    link = f"{SLICE}/{t}.parquet"
    if os.path.lexists(link):
        os.remove(link)
    os.symlink(os.path.abspath(f"{OUT}/{t}.parquet"), link)
print(f"done -> {SLICE}")
