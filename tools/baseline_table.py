#!/usr/bin/env python3
"""Regenerate the BASELINE.md per-query table and headline stats from
four bench maps.

Usage: python3 tools/baseline_table.py <spark001.json> <spark01.json>
                                       <duck001.json> <duck01.json>

Spark maps are BENCH_LOCAL.json files; DuckDB maps come from
tools/bench_duck.py. Only queries present in all four (the
oracle-matched set) are compared.
"""
import json, sys

s001 = json.load(open(sys.argv[1]))["queries"]
s01 = json.load(open(sys.argv[2]))["queries"]
d001 = json.load(open(sys.argv[3]))["queries"]
d01 = json.load(open(sys.argv[4]))["queries"]

common = sorted(set(s001) & set(s01) & set(d001) & set(d01))
n = len(common)

def tot(m):
    return sum(m[k] for k in common)

ts001, ts01, td001, td01 = tot(s001), tot(s01), tot(d001), tot(d01)
sm, dm = ts01 - ts001, td01 - td001          # marginal over +0.09 sf
s_rate, d_rate = sm / 0.09, dm / 0.09
s_fix = ts001 - s_rate * 0.01
d_fix = td001 - d_rate * 0.01
wins = sum(1 for k in common
           if (s01[k] - s001[k]) <= (d01[k] - d001[k]))

print(f"queries={n}")
print(f"spark: sf0.01={ts001:.1f}s sf0.1={ts01:.1f}s "
      f"fixed={s_fix:.1f}s rate={s_rate:.0f}s/sf")
print(f"duck:  sf0.01={td001:.2f}s sf0.1={td01:.2f}s "
      f"fixed={d_fix:.2f}s rate={d_rate:.0f}s/sf")
if d_rate > s_rate:
    x = (s_fix - d_fix) / (d_rate - s_rate)
    print(f"crossover sf={x:.2f}")
print(f"spark marginal <= duck marginal on {wins}/{n} queries")
print(f"sf1 extrapolation: spark={s_fix + s_rate:.0f}s duck={d_fix + d_rate:.0f}s")
print(f"sf10 extrapolation: spark={s_fix + 10 * s_rate:.0f}s duck={d_fix + 10 * d_rate:.0f}s")
print()
print("| query | Spark sf0.01 | Spark sf0.1 | DuckDB sf0.01 | DuckDB sf0.1 "
      "| Spark marginal | DuckDB marginal |")
print("|---|---|---|---|---|---|---|")
for k in sorted(common, key=lambda k: -(s01[k] - s001[k])):
    print(f"| `{k}` | {s001[k]:.2f} | {s01[k]:.2f} | {d001[k]:.3f} "
          f"| {d01[k]:.3f} | {s01[k] - s001[k]:+.2f} | {d01[k] - d001[k]:+.3f} |")
