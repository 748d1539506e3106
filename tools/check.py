#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load Verify's parquet
dumps, run each oracle SQL in DuckDB over the same fixture tables, compare
schema (column names) + sorted rows. Dev tool only — not part of the
shipped library.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.10g}"
    except Exception:
        pass
    return str(v)

def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)

fails = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{outdir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no Spark result dir")
        fails += 1
        continue
    try:
        spark_cols, spark_rows = None, None
        rel = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'")
        spark_cols = [d[0] for d in rel.description]
        spark_rows = rel.fetchall()
        rel = con.execute(sql)
        ora_cols = [d[0] for d in rel.description]
        ora_rows = rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: exec error: {str(e)[:200]}")
        fails += 1
        continue
    if sorted(spark_cols) != sorted(ora_cols):
        print(f"FAIL {name}: columns spark={sorted(spark_cols)} oracle={sorted(ora_cols)}")
        fails += 1
        continue
    a, b = canon_rows(spark_cols, spark_rows), canon_rows(ora_cols, ora_rows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        print(f"FAIL {name}: {len(spark_rows)} vs {len(ora_rows)} rows; first diffs: {diff}"
              if len(a) == len(b) else
              f"FAIL {name}: row count {len(spark_rows)} vs {len(ora_rows)}")
        only_a = [r for r in a if r not in set(b)][:2]
        only_b = [r for r in b if r not in set(a)][:2]
        print(f"  only-spark: {only_a}\n  only-oracle: {only_b}")
        fails += 1
    else:
        print(f"OK   {name} ({len(spark_rows)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
