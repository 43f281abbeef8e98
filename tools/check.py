#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each
target/verify_out/<name> parquet (written by graft.Verify), run the
matching oracle SQL from oracle_sql.json in DuckDB with views named after
the sfDir parquet tables, and compare as the driver does (columns sorted
by name, values hashed) — here: sorted-rows exact compare with float
round-trip via repr.

Usage: python3 tools/check.py [sfDir] [outDir]
"""
import json, sys, glob, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).removesuffix(".parquet")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    qdir = f"{out}/{name}"
    if not os.path.isdir(qdir):
        fails.append((name, "no spark output"))
        continue
    try:
        spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
        continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        fails.append((name, f"columns spark={sc} duck={dc}"))
        continue
    a = spark_df[sc].copy()
    b = duck_df[sc].copy()
    if len(a) != len(b):
        fails.append((name, f"rowcount spark={len(a)} duck={len(b)}"))
        continue
    # normalize dtypes for compare
    for c in sc:
        a[c] = a[c].astype(str)
        b[c] = b[c].astype(str)
    a = a.sort_values(sc).reset_index(drop=True)
    b = b.sort_values(sc).reset_index(drop=True)
    neq = (a != b).any(axis=1)
    if neq.any():
        i = neq.idxmax()
        fails.append((name, f"{int(neq.sum())}/{len(a)} rows differ; first at {i}:\n  spark={a.iloc[i].to_dict()}\n  duck ={b.iloc[i].to_dict()}"))
    else:
        # dtype note (driver may check schema)
        dt = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype)) for c in sc
              if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
        note = f"  [dtype diff: {dt}]" if dt else ""
        print(f"OK   {name} ({len(a)} rows){note}")

# rows-only queries (no oracle)
for qdir in sorted(glob.glob(f"{out}/*/")):
    name = os.path.basename(qdir.rstrip("/"))
    if name not in oracle:
        try:
            n = con.sql(f"SELECT count(*) FROM '{qdir}/*.parquet'").fetchone()[0]
            status = "OK  " if n > 0 else "WARN (0 rows)"
            print(f"{status} {name} [rows-only] ({n} rows)")
        except Exception as e:
            fails.append((name, f"rows-only read error: {e}"))

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
sys.exit(1 if fails else 0)
