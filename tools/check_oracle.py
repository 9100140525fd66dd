#!/usr/bin/env python3
"""Replays the driver's DuckDB oracle comparison locally.

Usage: python3 tools/check_oracle.py [sf_dir] [verify_out]
Reads <verify_out>/oracle_sql.json, runs each oracle SQL in DuckDB
over the parquet tables in <sf_dir>, and compares row sets against
the parquet results Verify dumped. Values are canonicalized (columns
sorted by name, floats at 6dp, rows sorted). Dtype differences are
reported as warnings, value/shape differences as failures.
"""
import duckdb, json, os, sys
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"create view {t} as select * from read_parquet('{p}')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    def v(x):
        if x is None or (isinstance(x, float) and pd.isna(x)):
            return "NULL"
        if isinstance(x, float):
            return f"{x:.6f}"
        return str(x)
    rows = sorted("|".join(v(x) for x in row)
                  for row in df.itertuples(index=False, name=None))
    return rows, list(df.columns)

def kind(dt):
    k = str(dt)
    if 'int' in k: return 'int' + ('64' if '64' in k else '32' if '32' in k else '?')
    if 'float' in k or 'double' in k: return 'float' + ('64' if '64' in k else '32')
    if 'bool' in k: return 'bool'
    if 'datetime' in k or 'timestamp' in k: return 'ts'
    return 'obj'

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, warns = [], []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        act = pd.read_parquet(f"{out}/{name}")
        er, ec = canon(exp)
        ar, ac = canon(act)
        if [c.lower() for c in ec] != [c.lower() for c in ac]:
            fails.append((name, f"schema mismatch exp={ec} act={ac}"))
            continue
        exp2 = exp.reindex(sorted(exp.columns), axis=1)
        act2 = act.reindex(sorted(act.columns), axis=1)
        for c1, c2 in zip(exp2.columns, act2.columns):
            k1, k2 = kind(exp2[c1].dtype), kind(act2[c2].dtype)
            if k1 != k2:
                warns.append(f"{name}.{c2}: oracle={exp2[c1].dtype} spark={act2[c2].dtype}")
        if er != ar:
            diff = [(a, b) for a, b in zip(er, ar) if a != b][:3]
            fails.append((name, f"rows exp={len(er)} act={len(ar)} firstdiff={diff}"))
    except Exception as e:
        fails.append((name, f"error {e}"))

print(f"checked {len(oracle)}; failures: {len(fails)}; dtype warnings: {len(warns)}")
for w in warns:
    print("DTYPE-WARN", w)
for n, m in fails:
    print("FAIL", n, m[:300])
sys.exit(1 if fails else 0)
