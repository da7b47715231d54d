#!/usr/bin/env python3
"""Invariant audit for the 17 v_* queries whose DuckDB oracles are
cost-bounded at sf1 (Lloyd-replay / list-op SQL over 20k x 64 vectors).

Their Spark dumps from a full `Verify <sf1Dir> <outDir>` run carry
designed audit booleans plus structure the derived sf1 corpus predicts
exactly (dev/make_sf1.py replicates each embedding 10x with vec_id
shifts, so every vector has 9 exact twins): this checks what the DuckDB
replay would have, from the dumps alone. Green here + the Spark leg
running all 202 without error + StreamProbe vecindexeq's stored-code
equality is the sf1 evidence for the v_* family.

Usage: python3 dev/sf1_vinvariants.py [verifyOutDir]  (default /tmp/verify_sf1)
Exit 1 on any violated invariant.
"""
import sys

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf1"
fail = 0


def check(name: str, sql: str, pred, describe: str) -> None:
    global fail
    got = duckdb.sql(sql.format(d=OUT)).fetchall()
    ok = pred(got)
    print(f"{'ok  ' if ok else 'FAIL'} {name}: {describe} -> {got}")
    if not ok:
        fail += 1


# designed audit booleans — true at ANY scale factor
check("v_ann_ivf", "SELECT count(*) FROM '{d}/v_ann_ivf/*.parquet' WHERE NOT ann_le_exact",
      lambda g: g[0][0] == 0, "0 bound violations across all probes")
check("v_ann_lsh", "SELECT coverage_ge_half, bounded_by_exact FROM '{d}/v_ann_lsh/*.parquet'",
      lambda g: g == [(True, True)], "coverage + boundedness audits")
check("v_pq_train_gain", "SELECT improved FROM '{d}/v_pq_train_gain/*.parquet'",
      lambda g: g == [(True,)], "trained codebook reduces MSE")
check("v_ivf_retrain", "SELECT improved FROM '{d}/v_ivf_retrain/*.parquet'",
      lambda g: g == [(True,)], "retrain improves (or holds) cell skew")
check("v_ivf_train_gain",
      "SELECT n_top10_in_probed_seed >= 8, n_top10_in_probed_trained >= 8, "
      "n_top10_in_probed_trained3 >= 8 FROM '{d}/v_ivf_train_gain/*.parquet'",
      lambda g: g == [(True, True, True)], "top-10 stays in probed cells")

# twin-structure predictions — exact on the derived sf1 corpus
check("v_neardup_cosine", "SELECT min(cosine), max(cosine) FROM '{d}/v_neardup_cosine/*.parquet'",
      lambda g: g == [(1.0, 1.0)], "top near-dup pairs are the exact twins (cos 1.0)")
check("v_ivfpq_search twins",
      "SELECT count(*) FROM '{d}/v_ivfpq_search/*.parquet' "
      "WHERE vec_id % 2000 = 0 AND adc_units = 0",
      lambda g: g[0][0] == 9, "vec 0's nine twins serve at ADC 0")
check("v_pq_recall", "SELECT n_overlap_top10 >= 9, n_shortlist_hits >= 9 "
      "FROM '{d}/v_pq_recall/*.parquet'",
      lambda g: g == [(True, True)], "twins recovered through PQ shortlist")
check("v_matryoshka_probe", "SELECT n_overlap_32 >= 9, n_overlap_16 >= 9 "
      "FROM '{d}/v_matryoshka_probe/*.parquet'",
      lambda g: g == [(True, True)], "twins survive 32- and 16-dim truncation")
check("v_semdedup", "SELECT sum(CASE WHEN kept THEN 1 ELSE 0 END) <= 2000, count(*) "
      "FROM '{d}/v_semdedup/*.parquet'",
      lambda g: g[0][0] and g[0][1] == 20000,
      "10x twin corpus collapses to <= 2000 representatives")

# shape sanity on the rest (row counts the plans guarantee)
for name, n in [("v_ivfpq_trained", 10), ("v_kmeans_refine", 40),
                ("v_maxsim_probe", 10), ("v_mmr_rerank", 10),
                ("v_label_cohesion", 10), ("v_ivfpq_batch", 192),
                ("v_ivfpq_rerank", 10)]:
    check(name, f"SELECT count(*) FROM '{{d}}/{name}/*.parquet'",
          lambda g, n=n: g[0][0] == n, f"exactly {n} rows")

print("ALL GREEN" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
