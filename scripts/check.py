#!/usr/bin/env python3
"""Local pre-flight mimic of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet written by graft.Verify, runs the
matching SQL from <out>/oracle_sql.json in DuckDB over the sf tables,
and compares schema + values (column-name-sorted, row-sorted hash —
same spirit as the driver's CORRECTNESS check).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

out_dir, sf_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name in sorted(oracle):
    pq_path = os.path.join(out_dir, name)
    if not os.path.isdir(pq_path):
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    spark_df = pd.concat(
        [pd.read_parquet(p) for p in sorted(glob.glob(f"{pq_path}/*.parquet"))],
        ignore_index=True)
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
        fails += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
        fails += 1
        continue
    mismatch = []
    for c in s.columns:
        a, b = s[c], d[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                ok = np.allclose(a.astype(float), b.astype(float),
                                 rtol=0, atol=0, equal_nan=True)
            else:
                ok = a.astype(str).equals(b.astype(str))
        except Exception as e:
            ok = False
        if not ok:
            mismatch.append(c)
    if mismatch:
        print(f"FAIL {name}: value mismatch in {mismatch}")
        for c in mismatch[:2]:
            diff = s[c].astype(str) != d[c].astype(str)
            i = diff[diff].index[:3]
            print(f"   {c}: spark={s[c][i].tolist()} duck={d[c][i].tolist()}")
        fails += 1
    else:
        # dtype note (informational; driver may be stricter)
        dt = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
              if str(s[c].dtype) != str(d[c].dtype)]
        note = f"  dtypes differ: {dt}" if dt else ""
        print(f"OK   {name} ({len(s)} rows){note}")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
