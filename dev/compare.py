#!/usr/bin/env python3
"""Local oracle-parity checker, mimicking the driver's DuckDB compare.

Usage: python3 dev/compare.py <sfDir> <verifyOutDir> [--skip n1,n2,...] [--only n1,n2,...]

--skip/--only scope the oracle set (used by dev/sf1_sweep.py to route the
17 list-op-heavy v_* oracles to the sf1 slice instead of full sf1).

Registers each testdata parquet as a DuckDB view, runs every SQL in
<verifyOutDir>/oracle_sql.json, loads the Spark result parquet from
<verifyOutDir>/<name>/, and compares: column names (sorted), row count,
and values row-by-row after sorting columns by name (floats with a tiny
tolerance so real bugs are distinguishable from ULP drift — the driver's
hash compare is stricter, so any reported float drift must be fixed).
"""
import json, sys, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# r19 sweep lesson: one long-lived DuckDB connection accumulates memory
# across ~200 heavy list-op queries and eventually wedges (the sf1 sweep
# had to be finished piecemeal). Recycle the connection every N queries.
RECYCLE_EVERY = 20

def fresh_con(sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    return con

def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files])

def norm(v):
    if v is None:
        return None
    if hasattr(v, "timestamp"):  # datetime-like -> epoch seconds float
        try:
            return v.timestamp()
        except Exception:
            return str(v)
    return v

def cmp_vals(a, b):
    a, b = norm(a), norm(b)
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    skip, only = set(), None
    rest = sys.argv[3:]
    while rest:
        if len(rest) < 2:
            sys.exit(f"flag {rest[0]} needs a comma-separated name list")
        flag, val, rest = rest[0], rest[1], rest[2:]
        if flag == "--skip":
            skip |= set(val.split(","))
        elif flag == "--only":
            only = set(val.split(","))
        else:
            sys.exit(f"unknown flag {flag}")
    con = fresh_con(sfdir)
    all_oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    # a scope name absent from oracle_sql.json is a harness bug (renamed
    # query, stale list): silently dropping it would shrink the checked
    # set and overclaim the sweep — fail loudly instead
    unknown = ((only or set()) | skip) - set(all_oracles)
    if unknown:
        sys.exit(f"--only/--skip name(s) not in oracle_sql.json: {sorted(unknown)}")
    oracles = {n: s for n, s in all_oracles.items()
               if n not in skip and (only is None or n in only)}
    failures = 0
    for qi, (name, sql) in enumerate(sorted(oracles.items())):
        if qi > 0 and qi % RECYCLE_EVERY == 0:
            con.close()
            con = fresh_con(sfdir)
        spark_tbl = load_spark(outdir, name)
        if spark_tbl is None:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        scols, dcols = sorted(spark_tbl.column_names), sorted(duck.column_names)
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            failures += 1
            continue
        srows = [tuple(r[c] for c in scols) for r in spark_tbl.to_pylist()]
        drows = [tuple(r[c] for c in dcols) for r in duck.to_pylist()]
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            failures += 1
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            if not all(cmp_vals(a, b) for a, b in zip(sr, dr)):
                bad = (i, sr, dr)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} spark={bad[1]} duck={bad[2]}")
            failures += 1
        else:
            # exactness probe: warn on any float not bit-identical
            drift = 0
            for sr, dr in zip(srows, drows):
                for a, b in zip(sr, dr):
                    a, b = norm(a), norm(b)
                    if isinstance(a, float) and isinstance(b, float) and a != b \
                       and not (math.isnan(a) and math.isnan(b)):
                        drift += 1
            tag = f" (float drift in {drift} cells!)" if drift else ""
            print(f"OK   {name}: {len(srows)} rows{tag}")
    # rows-only listing is meaningless under a scope filter
    missing = [] if (skip or only is not None) else \
        [n for n in glob.glob(f"{outdir}/*/") if n.split('/')[-2] not in oracles]
    for m in sorted(missing):
        nm = m.split('/')[-2]
        t = load_spark(outdir, nm)
        print(f"NOORACLE {nm}: {t.num_rows if t is not None else 0} rows (rows-only check)")
    print(f"\n{failures} failures / {len(oracles)} oracled queries")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
