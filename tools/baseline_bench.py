#!/usr/bin/env python3
"""Times the oracle SQL suite in DuckDB over the sf0.1 parquet tables.
Median of 3 runs per query, full materialization (fetchall)."""
import duckdb, json, os, statistics, time

sf = "/root/testdata/sf0.1"
oracle = json.load(open("/tmp/verify_out/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"create view {t} as select * from read_parquet('{p}')")

res = {}
for name, sql in sorted(oracle.items()):
    # warmup
    try:
        con.execute(sql).fetchall()
    except Exception as e:
        res[name] = None; print(name, "ERR", str(e)[:80]); continue
    ts = []
    for _ in range(3):
        t0 = time.time(); con.execute(sql).fetchall(); ts.append(time.time()-t0)
    res[name] = statistics.median(ts)
    print(f"{name:28s} {res[name]:.3f}")
ok = {k:v for k,v in res.items() if v is not None}
print(json.dumps({"total": sum(ok.values()), "n": len(ok)}))
json.dump(res, open("/tmp/duckdb_baseline.json","w"), indent=1)
