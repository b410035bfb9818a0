#!/usr/bin/env python3
"""Build a scaled-up corpus fixture dir for oracle spot-runs above sf0.1.

Replicates documents/embeddings k times with id columns shifted by
rep * (max_id + 1) per replica (ids stay unique; every replica's text /
vector payload is byte-identical, which deliberately multiplies the
duplicate density the dedup queries must absorb). All other tables are
copied 1x so Sources.assertFixtureSchemas and incidental reads work.
Both engines (Spark via Verify, DuckDB via compare.py) read the SAME
scaled dir, so the hash-compare contract is unchanged.

Usage: python3 tools/scale_fixtures.py <srcSfDir> <dstDir> <k>
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT_COLS = {"documents": "doc_id", "embeddings": "vec_id"}
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)

for t in TABLES:
    sp = os.path.join(src, f"{t}.parquet")
    dp = os.path.join(dst, f"{t}.parquet")
    if not os.path.exists(sp):
        continue
    if t not in SHIFT_COLS:
        shutil.copyfile(sp, dp)
        continue
    tab = pq.read_table(sp)
    idc = SHIFT_COLS[t]
    idt = tab.schema.field(idc).type
    off = pc.max(tab[idc]).as_py() + 1
    reps = []
    for r in range(k):
        shifted = pc.cast(pc.add(tab[idc], r * off), idt)
        reps.append(tab.set_column(tab.schema.get_field_index(idc),
                                   tab.schema.field(idc), shifted))
    out = pa.concat_tables(reps)
    pq.write_table(out, dp)
    print(f"{t}: {tab.num_rows} -> {out.num_rows} rows (k={k}, offset={off})")
