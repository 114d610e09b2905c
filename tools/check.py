#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: compare Verify's parquet
outputs against DuckDB running oracle_sql.json on the same sf dir.
Usage: python3 tools/check.py <sfDir> <outDir>"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
names = sorted([os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p)])
fails = []
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO OUTPUT"); fails.append(name); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if name not in oracle:
        print(f"{name}: rows-only ({len(spark_df)} rows)"); continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails.append(name); continue
    # driver-style: sort columns by name, then sort rows, then compare values
    a = spark_df[sorted(spark_df.columns)]
    b = duck_df[sorted(duck_df.columns)]
    if list(a.columns) != list(b.columns):
        print(f"{name}: COLUMN MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
        fails.append(name); continue
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    if len(a) != len(b):
        print(f"{name}: ROW COUNT spark={len(a)} duck={len(b)}"); fails.append(name); continue
    ok = True
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype) != str(bv.dtype):
            print(f"{name}: dtype diff col={c} spark={av.dtype} duck={bv.dtype}")
        try:
            eq = (av.fillna("__N__") == bv.fillna("__N__")) if av.dtype == object else \
                 ((av.isna() & bv.isna()) | (av == bv))
        except Exception:
            eq = av.astype(str) == bv.astype(str)
        if not eq.all():
            bad = (~eq).idxmax()
            print(f"{name}: VALUE MISMATCH col={c} row={bad} spark={av[bad]!r} duck={bv[bad]!r} "
                  f"(#bad={int((~eq).sum())})")
            ok = False
    if ok: print(f"{name}: OK ({len(a)} rows)")
    else: fails.append(name)

print(f"\n{len(names)-len(fails)}/{len(names)} pass; fails: {fails}")
sys.exit(1 if fails else 0)
