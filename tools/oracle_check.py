#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query output
written by graft.Verify, run the corresponding oracle SQL in DuckDB over the
same fixture tables and compare (columns sorted by name, rows sorted,
values compared exactly; floats with tiny tolerance reported separately)."""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in glob.glob(f"{SF_DIR}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].map(lambda v: str(v).removesuffix(" 00:00:00")
                              if v is not None else None)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)

ok, bad = [], []
for name in sorted(oracle):
    spark_dir = f"{OUT_DIR}/{name}"
    if not os.path.isdir(spark_dir):
        bad.append((name, "NO SPARK OUTPUT"))
        continue
    try:
        sdf = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{spark_dir}/*.parquet")])
        ddf = con.execute(oracle[name]).df()
    except Exception as e:
        bad.append((name, f"EXEC FAIL: {str(e)[:200]}"))
        continue
    s, d = normalize(sdf), normalize(ddf)
    if list(s.columns) != list(d.columns):
        bad.append((name, f"COLS spark={list(s.columns)} duck={list(d.columns)}"))
        continue
    if len(s) != len(d):
        bad.append((name, f"ROWS spark={len(s)} duck={len(d)}"))
        continue
    mismatch = None
    # the driver's hash is type-sensitive: a DuckDB HUGEINT (pandas float)
    # vs Spark BIGINT hashes differently even when values are equal
    for c in s.columns:
        if s[c].dtype.kind != d[c].dtype.kind:
            mismatch = f"col {c}: DTYPE spark={s[c].dtype} duck={d[c].dtype}"
            break
    for c in s.columns:
        if mismatch:
            break
        sv, dv = s[c], d[c]
        try:
            import numpy as np
            if sv.dtype.kind == "f" or dv.dtype.kind == "f":
                eq = np.isclose(sv.astype(float), dv.astype(float), rtol=0, atol=0, equal_nan=True)
                exact = eq.all()
                close = np.isclose(sv.astype(float), dv.astype(float), rtol=1e-9, equal_nan=True).all()
                if not exact:
                    mismatch = f"col {c}: float {'CLOSE-not-exact' if close else 'DIFF'}"
                    if not close:
                        break
            else:
                if not sv.equals(dv):
                    neq = (sv != dv)
                    i = neq[neq].index[0] if neq.any() else None
                    mismatch = f"col {c}: first diff at row {i}: spark={sv[i]!r} duck={dv[i]!r}"
                    break
        except Exception as e:
            mismatch = f"col {c}: compare error {e}"
            break
    if mismatch:
        bad.append((name, mismatch))
    else:
        ok.append(name)

print(f"PASS {len(ok)}/{len(ok)+len(bad)}: {' '.join(ok)}")
for name, why in bad:
    print(f"FAIL {name}: {why}")
sys.exit(1 if bad else 0)
