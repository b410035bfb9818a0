#!/usr/bin/env python3
"""Content-level determinism check between two graft.Verify output dirs.

`diff -r` cannot do this: parquet part files carry random UUID names, so
recursive diff reports every file as "only in" one side and compares
nothing. This reads each query's parquet CONTENT, canonicalizes row
order, and requires exact value equality.

Row order is canonicalized (every cell stringified, rows sorted) because
result order is NOT part of the engine contract: the correctness gate
(compare.py and the driver's replica) sorts rows before hashing, and the
engine stopped global-sorting query outputs — a total-order shuffle of a
full result is never the right plan at scale, and callers who want
presentation order sort at the end themselves.

Usage: python3 tools/detcheck.py <outDirA> <outDirB>
"""
import glob
import os
import sys

import pyarrow.parquet as pq

def canon(df):
    out = df.copy()
    for c in out.columns:
        # \x00-prefixed sentinel: cannot collide with a genuine string
        # value "null" (a NULL<->"null" flip must fail the check)
        out[c] = out[c].map(lambda x: "\x00null" if x is None else str(x))
    return out.sort_values(list(out.columns)).reset_index(drop=True)

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
    if list(ta.columns) != list(tb.columns) or not canon(ta).equals(canon(tb)):
        bad.append(d)
if bad:
    print(f"NONDETERMINISTIC ({len(bad)}/{checked}): {bad}")
    sys.exit(1)
print(f"deterministic: {checked} queries content-identical")
