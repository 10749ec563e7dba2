#!/usr/bin/env python3
"""Dev tooling only (driver-side python, like compare.py): turn two
repeat-measured Bench JSONs (small SF + probe SF) into the SCALE.md
ratio table — per-query MEDIAN ratios plus each run's noise figure, so
the table records the trust context VERDICT r12 #4 asked for (the r12
sf1 table was single-timed-round).

Usage: python3 tools/probe_ratios.py <bench_small.json> <bench_probe.json> [top_n]
"""
import json
import sys

small = json.load(open(sys.argv[1]))
probe = json.load(open(sys.argv[2]))
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 20

qs, qp = small["queries"], probe["queries"]
common = sorted(set(qs) & set(qp))
ratios = sorted(((qp[q] / qs[q], q) for q in common if qs[q] > 0),
                reverse=True)

print(f"small: total={small['value']:.1f}s n={small['n_queries']} "
      f"repeats={small['repeats']} noise={small['noise_rel_spread']:.3f}")
print(f"probe: total={probe['value']:.1f}s n={probe['n_queries']} "
      f"repeats={probe['repeats']} noise={probe['noise_rel_spread']:.3f}")
rs = sorted(r for r, _ in ratios)
med = rs[len(rs) // 2] if rs else float("nan")
print(f"total ratio: {probe['value'] / small['value']:.2f}x   "
      f"median per-query ratio: {med:.2f}x   queries: {len(common)}")
print()
print("| query | sf0.1 s | sf1 s | ratio (10× data) |")
print("|---|---|---|---|")
for r, q in ratios[:top_n]:
    print(f"| {q} | {qs[q]:.2f} | {qp[q]:.2f} | {r:.1f}× |")
