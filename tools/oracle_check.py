#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: runs each oracle SQL
from a Verify dump's oracle_sql.json in DuckDB over the same sf tables and
diff's against the Spark parquet output (columns sorted by name, rows sorted,
values stringified). Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]
"""
import duckdb, json, sys, math

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def cell(v):
        if isinstance(v, float):
            return "%.10g" % v if not math.isnan(v) else "nan"
        return str(v)
    return sorted(tuple(cell(r[i]) for i in order) for r in rows)

fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        s = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
        srows, scols = s.fetchall(), [d[0] for d in s.description]
        o = con.sql(sql)
        orows, ocols = o.fetchall(), [d[0] for d in o.description]
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fail += 1
        continue
    if sorted(scols) != sorted(ocols):
        print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
        fail += 1
    elif len(srows) != len(orows):
        print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
        fail += 1
    elif norm(srows, scols) != norm(orows, ocols):
        a, b = norm(srows, scols), norm(orows, ocols)
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        print(f"FAIL {name}: value diff, first: {diff}")
        fail += 1
    else:
        print(f"ok   {name} ({len(srows)} rows)")
print(f"{'ALL GREEN' if fail == 0 else str(fail) + ' FAILURES'}")
sys.exit(1 if fail else 0)
