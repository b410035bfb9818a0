#!/usr/bin/env python3
"""Assemble BENCH_PROFILE_r20.json from the interleaved 3-arm focused
runs (r19 VERDICT ask #1: adjudicate the 10-query r19 driver-window
tail under BOTH the builder bench conf and the driver's
partitions=cpus conf).

Arms (each = 3 interleaved JVMs, Bench's internal pair protocol, so up
to 6 samples per JVM and ~18 per arm):
  A: builder bench conf  — shuffle partitions 8,  AQE off (floor conf)
  B: driver conf         — shuffle partitions 32, AQE off
  C: driver conf w/ AQE  — shuffle partitions 32, AQE on

Rule (same as r18/r19): a driver reading is a LOAD ARTIFACT if the
focused arm-A min <= 1.3x the committed window-16 floor
(BENCH_LOCAL.json). A B-or-C min materially above the A min on the
same interleaved windows is a REAL conf delta, not load.

Usage: python3 tools/profile_r20.py <glob_prefix> <out.json>
       [extra_json_to_merge ...]
e.g.   python3 tools/profile_r20.py /tmp/prof_r20 BENCH_PROFILE_r20.json
"""
import glob
import json
import sys

prefix, out = sys.argv[1], sys.argv[2]
floors = json.load(open("BENCH_LOCAL.json"))["queries"]

arms = {}
for arm in ("A", "B", "C"):
    samples = {}
    for p in sorted(glob.glob(f"{prefix}_{arm}_*.json")):
        d = json.load(open(p))
        for q, ss in d["samples"].items():
            samples.setdefault(q, []).extend(ss)
    if samples:
        arms[arm] = samples

queries = {}
for q in sorted(set().union(*[set(s) for s in arms.values()])):
    floor = floors.get(q)
    rec = {"floor_w16": floor}
    for arm, label in (("A", "builder_p8_noaqe"), ("B", "driver_p32_noaqe"),
                       ("C", "driver_p32_aqe")):
        if arm in arms and q in arms[arm]:
            ss = arms[arm][q]
            rec[f"samples_{label}"] = [round(s, 4) for s in ss]
            rec[f"min_{label}"] = round(min(ss), 4)
            if floor:
                rec[f"ratio_{label}"] = round(min(ss) / floor, 3)
    if floor and "min_builder_p8_noaqe" in rec:
        a = rec["min_builder_p8_noaqe"]
        rec["conf_delta_p32_vs_p8"] = round(
            rec.get("min_driver_p32_noaqe", a) / a, 3)
    queries[q] = rec

result = {
    "protocol": ("interleaved 3-arm focused runs (A builder p8/noAQE, "
                 "B driver p32/noAQE, C driver p32/AQE; 3 JVMs per arm, "
                 "Bench pair protocol inside each), FIRST session window "
                 "before any compile churn; arms A/B/C alternate per "
                 "JVM so host-load windows hit all arms equally"),
    "trigger": ("r19 VERDICT ask #1: 10-query >1.5x driver-window tail "
                "(window/agg family), adjudicated under BOTH confs"),
    "rule": ("load artifact if arm-A min <= 1.3x committed window-16 "
             "floor (BENCH_LOCAL.json); arm-B min >> arm-A min on the "
             "same interleaved windows = REAL driver-conf cost"),
    "queries": queries,
}
for extra in sys.argv[3:]:
    result.setdefault("followups", []).append(json.load(open(extra)))
with open(out, "w") as f:
    json.dump(result, f, indent=1)
print(f"wrote {out} ({len(queries)} queries)")
