import duckdb, json, glob, os, sys
import pandas as pd

sf = "/root/testdata/sf0.01"
out = "/tmp/verify_out"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"create view {t} as select * from read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        act = pd.read_parquet(f"{out}/{name}")
        # normalize: sort columns by name, canonicalize values, sort rows
        def canon(df):
            df = df.reindex(sorted(df.columns), axis=1)
            def v(x):
                if x is None or (isinstance(x, float) and pd.isna(x)): return "NULL"
                if isinstance(x, float): return f"{x:.6f}"
                return str(x)
            rows = sorted("|".join(v(x) for x in row) for row in df.itertuples(index=False, name=None))
            return rows, list(df.columns)
        er, ec = canon(exp); ar, ac = canon(act)
        if [c.lower() for c in ec] != [c.lower() for c in ac]:
            fails.append((name, f"schema mismatch exp={ec} act={ac}"))
        elif er != ar:
            diff = [(a,b) for a,b in zip(er,ar) if a!=b][:3]
            fails.append((name, f"rows exp={len(er)} act={len(ar)} firstdiff={diff}"))
    except Exception as e:
        fails.append((name, f"error {e}"))
print(f"checked {len(oracle)}; failures: {len(fails)}")
for n, m in fails:
    print("FAIL", n, m[:300])
