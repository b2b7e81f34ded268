#!/usr/bin/env python3
"""Dev harness mirroring the driver: run SparkEntry oracle SQL in DuckDB against the same parquet and compare with the Verify outputs. Usage: python3 tools/oracle_compare.py <sfDir> <verifyOutDir>"""
import duckdb, json, sys, glob, math

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for tbl in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sfdir}/{tbl}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return f"{v:.9g}"
    return str(v)

fails = []
for name, sql in sorted(oracle.items()):
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails.append(name); continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails.append(name); continue
    sdf = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    ocols = sorted(odf.columns); scols = sorted(sdf.columns)
    if ocols != scols:
        print(f"FAIL {name}: columns differ oracle={ocols} spark={scols}")
        fails.append(name); continue
    orows = sorted(tuple(norm(v) for v in r) for r in odf[ocols].itertuples(index=False))
    srows = sorted(tuple(norm(v) for v in r) for r in sdf[scols].itertuples(index=False))
    if len(orows) != len(srows):
        print(f"FAIL {name}: rowcount oracle={len(orows)} spark={len(srows)}")
        fails.append(name); continue
    if orows != srows:
        diff = [(o, s) for o, s in zip(orows, srows) if o != s][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {diff}")
        fails.append(name); continue
    print(f"OK   {name} ({len(srows)} rows)")

# rows-only checks for queries without oracle
import os
for d in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, d)
    if os.path.isdir(p) and d not in oracle:
        n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
        status = "OK  " if n > 0 else "WARN(0 rows)"
        print(f"{status} {d} rows-only: {n} rows")

print(f"\n{'ALL OK' if not fails else f'{len(fails)} FAILURES: {fails}'}")
sys.exit(1 if fails else 0)
