#!/usr/bin/env python3
"""Content-level determinism check between two graft.Verify output dirs.

`diff -r` cannot do this: parquet part files carry random UUID names, so
recursive diff reports every file as "only in" one side and compares
nothing. This reads each query's parquet CONTENT and requires exact
frame equality (values AND row order).

Usage: python3 tools/detcheck.py <outDirA> <outDirB>
"""
import glob
import os
import sys

import pyarrow.parquet as pq

a_dir, b_dir = sys.argv[1], sys.argv[2]
bad, checked = [], 0
for d in sorted(os.listdir(a_dir)):
    pa, pb = os.path.join(a_dir, d), os.path.join(b_dir, d)
    if not os.path.isdir(pa):
        continue
    if not os.path.isdir(pb):
        bad.append(f"{d}: missing in {b_dir}")
        continue
    ta = pq.read_table(glob.glob(pa + "/*.parquet")).to_pandas()
    tb = pq.read_table(glob.glob(pb + "/*.parquet")).to_pandas()
    checked += 1
    if not ta.equals(tb):
        bad.append(d)
if bad:
    print(f"NONDETERMINISTIC ({len(bad)}/{checked}): {bad}")
    sys.exit(1)
print(f"deterministic: {checked} queries content-identical")
