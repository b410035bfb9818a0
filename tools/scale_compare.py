#!/usr/bin/env python3
"""Whole-suite oracle pass above sf0.1 (r18 VERDICT ask #3): the same
hash-compare contract as tools/compare.py, plus per-query DuckDB
wall-clock and a TIMEOUT so a super-linear oracle (the CC recursive CTE
took 1,543 s at 4x density in r13) is recorded as `infeasible` instead
of hanging the pass. Each oracle runs in its own subprocess — DuckDB
has no reliable in-process query kill — and the parent hash-compares
the parquet the child wrote.

Usage: python3 tools/scale_compare.py <sfDir> <verifyOutDir> <out.json>
       [timeout_sec_per_query]  (default 300)
"""
import glob
import json
import os
import subprocess
import sys
import tempfile
import time

import pandas as pd
import pyarrow.parquet as pq

sf_dir, out_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
timeout = float(sys.argv[4]) if len(sys.argv) > 4 else 300.0

with open(os.path.join(out_dir, "oracle_sql.json")) as f:
    oracle = json.load(f)

CHILD = r"""
import duckdb, json, os, sys, time
sf_dir, sql_path, out_parquet = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.isdir(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
sql = open(sql_path).read()
t0 = time.time()
con.execute(f"COPY ({sql}) TO '{out_parquet}' (FORMAT PARQUET)")
print(json.dumps({"sec": time.time() - t0}))
"""


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            out[c] = s.round(6).map(
                lambda x: "null" if pd.isna(x) else f"{x:.6f}")
        else:
            out[c] = s.map(lambda x: "null" if x is None or
                           (isinstance(x, float) and pd.isna(x)) else str(x))
    out = out.sort_values(list(out.columns)).reset_index(drop=True)
    return out


results = {}
t_all0 = time.time()
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        results[name] = {"status": "no_output"}
        continue
    if name not in oracle:
        results[name] = {"status": "rows_only"}
        continue
    with tempfile.TemporaryDirectory() as tmp:
        sqlp = os.path.join(tmp, "q.sql")
        outp = os.path.join(tmp, "out.parquet")
        with open(sqlp, "w") as f:
            f.write(oracle[name])
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c", CHILD, sf_dir, sqlp, outp],
                capture_output=True, text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            results[name] = {"status": "infeasible",
                             "timeout_sec": timeout}
            print(f"{name}: INFEASIBLE (> {timeout:.0f}s)", flush=True)
            continue
        wall = time.time() - t0
        if proc.returncode != 0:
            results[name] = {"status": "oracle_error",
                             "err": proc.stderr.strip()[-300:]}
            print(f"{name}: ORACLE_ERROR", flush=True)
            continue
        duck_sec = json.loads(proc.stdout.strip().splitlines()[-1])["sec"]
        spark_df = pq.read_table(files).to_pandas()
        duck_df = pq.read_table(outp).to_pandas()
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        results[name] = {"status": "schema_mismatch",
                         "spark_cols": list(a.columns),
                         "duck_cols": list(b.columns)}
    elif len(a) != len(b):
        results[name] = {"status": "rowcount_mismatch",
                         "spark": len(a), "duck": len(b)}
    elif not a.equals(b):
        diff = (a != b).any(axis=1)
        idx = diff[diff].index[:3].tolist()
        results[name] = {"status": "value_mismatch", "rows": len(a),
                         "first_diffs": [{"row": int(i),
                                          "spark": a.loc[i].to_dict(),
                                          "duck": b.loc[i].to_dict()}
                                         for i in idx]}
    else:
        results[name] = {"status": "ok", "rows": len(a),
                         "duck_sec": round(duck_sec, 3),
                         "duck_wall_sec": round(wall, 3)}
    print(f"{name}: {results[name]['status']}"
          f" ({results[name].get('duck_sec', '-')}s)", flush=True)

summary = {}
for r in results.values():
    summary[r["status"]] = summary.get(r["status"], 0) + 1
artifact = {"sf_dir": sf_dir, "timeout_sec": timeout,
            "total_wall_sec": round(time.time() - t_all0, 1),
            "duck_total_sec": round(sum(
                r.get("duck_sec", 0) for r in results.values()), 1),
            "summary": summary, "queries": results}
with open(out_path, "w") as f:
    json.dump(artifact, f, indent=1, default=str)
print(f"\n== {json.dumps(summary)} -> {out_path}", file=sys.stderr)
