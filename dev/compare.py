#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare (rows, schema-by-name,
value multiset) to the Spark parquet dumped by graft.Verify.

Usage: python3 dev/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols2 = [cols[i] for i in order]
    def norm(v):
        if isinstance(v, float):
            return round(v, 6)
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, norm(x)) for k, x in v.items()))
        return v
    rows2 = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return cols2, rows2

fails = 0
for name in sorted(oracle):
    spark_dir = os.path.join(outdir, name)
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir")
        fails += 1
        continue
    s = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
    scols, srows = s.description, s.fetchall()
    try:
        o = con.execute(oracle[name])
        ocols, orows = o.description, o.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    sc, sr = canon([c[0] for c in scols], srows)
    oc, orr = canon([c[0] for c in ocols], orows)
    if sc != oc:
        print(f"FAIL {name}: schema mismatch spark={sc} oracle={oc}")
        fails += 1
    elif sr != orr:
        msg = f"rows spark={len(sr)} oracle={len(orr)}"
        diff1 = [r for r in sr if r not in set(orr)][:3]
        diff2 = [r for r in orr if r not in set(sr)][:3]
        print(f"FAIL {name}: value mismatch ({msg}) spark-only={diff1} oracle-only={diff2}")
        fails += 1
    else:
        print(f"PASS {name}: {len(sr)} rows")
sys.exit(1 if fails else 0)
