#!/usr/bin/env python3
"""Builds the BASELINE.md per-query table from one same-session pair:
graft Bench JSON (first line of the Bench output) + the DuckDB
baseline JSON written by baseline_bench.py. Prints markdown + summary
stats to stdout."""
import json, sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_r4_clean.txt"
duck_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/duckdb_baseline.json"

bench = json.loads(open(bench_path).readline())
duck = {k: v for k, v in json.load(open(duck_path)).items() if v is not None}
qs = bench["queries"]

rows = []
for name in sorted(qs):
    g = qs[name]
    d = duck.get(name)
    rows.append((name, d, g))

both = [(n, d, g) for n, d, g in rows if d is not None]
gt = sum(g for _, _, g in both)
dt = sum(d for _, d, _ in both)
compute = [(n, d, g) for n, d, g in both if d >= 0.05]
floor = [(n, d, g) for n, d, g in both if d < 0.05]

print(f"graft total (oracle-matched {len(both)} queries): {gt:.1f} s")
print(f"duckdb total: {dt:.1f} s   ratio {gt/dt:.2f}x")
print(f"graft all-{len(qs)}-query total: {sum(qs.values()):.1f} s")
cg = sum(g for _, _, g in compute); cd = sum(d for _, d, _ in compute)
print(f"compute-bound (duckdb >= 50 ms, n={len(compute)}): "
      f"graft {cg:.1f} vs duckdb {cd:.1f} = {cg/cd:.2f}x; "
      f"graft faster on {sum(1 for _, d, g in compute if g < d)}")
fg = sum(g for _, _, g in floor); fd = sum(d for _, d, _ in floor)
print(f"floor-bound (n={len(floor)}): graft {fg:.1f} vs duckdb {fd:.1f}")
over2 = [(n, d, g) for n, d, g in both if d >= 0.02 and g > 2 * d]
print(f"queries >2x with duckdb >= 20 ms: {len(over2)}")
for n, d, g in sorted(over2, key=lambda t: -t[2] / t[1]):
    print(f"  {n}: {g:.2f} vs {d:.2f} = {g/d:.1f}x")
print()
print("| query | DuckDB s | graft s | ratio |")
print("|---|---|---|---|")
for n, d, g in sorted(both, key=lambda t: -t[1]):
    print(f"| {n} | {d:.3f} | {g:.3f} | {g/d:.2f} |")
