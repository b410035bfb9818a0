#!/usr/bin/env python3
"""Local replica of the driver's correctness check: for each query dir in
outDir, run the matching oracle SQL in DuckDB over the sf parquet tables,
sort columns by name, sort rows, and hash-compare values.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

with open(os.path.join(out_dir, "oracle_sql.json")) as f:
    oracle = json.load(f)

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize float columns to 6dp strings to absorb representation noise
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            out[c] = s.round(6).map(lambda x: "null" if pd.isna(x) else f"{x:.6f}")
        else:
            out[c] = s.map(lambda x: "null" if x is None or (isinstance(x, float) and pd.isna(x)) else str(x))
    out = out.sort_values(list(out.columns)).reset_index(drop=True)
    return out

results = {}
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        results[name] = {"status": "no_output"}
        continue
    spark_df = pq.read_table(files).to_pandas()
    if name not in oracle:
        results[name] = {"status": "rows_only", "rows": len(spark_df)}
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        results[name] = {"status": "oracle_error", "err": str(e)[:200]}
        continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        results[name] = {"status": "schema_mismatch",
                         "spark_cols": list(a.columns), "duck_cols": list(b.columns)}
    elif len(a) != len(b):
        results[name] = {"status": "rowcount_mismatch", "spark": len(a), "duck": len(b)}
    elif not a.equals(b):
        diff = (a != b).any(axis=1)
        idx = diff[diff].index[:3].tolist()
        results[name] = {"status": "value_mismatch", "rows": len(a),
                         "first_diffs": [{"row": int(i),
                                          "spark": a.loc[i].to_dict(),
                                          "duck": b.loc[i].to_dict()} for i in idx]}
    else:
        results[name] = {"status": "ok", "rows": len(a)}

n_ok = sum(1 for r in results.values() if r["status"] == "ok")
n_rows_only = sum(1 for r in results.values() if r["status"] == "rows_only")
print(json.dumps(results, indent=1, default=str))
print(f"\n== {n_ok} ok, {n_rows_only} rows_only, "
      f"{len(results) - n_ok - n_rows_only} bad, {len(results)} total",
      file=sys.stderr)
