#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir] [--run]
  --run: invoke sbt runMain graft.Verify first.
Compares each outdir/<name>/ parquet against DuckDB running
oracle_sql.json over the same sf tables. Columns sorted by name,
rows sorted by all columns; exact compare plus 1e-9 float fallback.
"""
import json, os, subprocess, sys

import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    if "--run" in sys.argv:
        subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
                       cwd="/root/repo", check=True)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_noora = 0
    # a query that threw in Verify leaves an oracle entry but no output dir —
    # surface it as a failure instead of silently skipping it
    for missing in sorted(set(oracles) - set(names)):
        n_fail += 1
        print(f"FAIL [no-output] {missing}: query produced no parquet (threw in Verify?)")
    for name in names:
        spark_df = pd.read_parquet(os.path.join(outdir, name))
        if name not in oracles:
            n_noora += 1
            print(f"  [rows-only] {name}: {len(spark_df)} rows")
            continue
        try:
            ora_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            n_fail += 1
            print(f"FAIL [oracle-err] {name}: {e}")
            continue
        ok, msg = compare(spark_df, ora_df)
        if ok:
            n_pass += 1
            print(f"  PASS {name} ({len(spark_df)} rows){msg}")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    sys.exit(1 if n_fail else 0)

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c].dtype):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c].dtype):
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

def compare(a, b):
    if sorted(a.columns) != sorted(b.columns):
        return False, f"schema: spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"rowcount: spark={len(a)} oracle={len(b)}"
    a, b = norm(a), norm(b)
    exact = True
    for c in a.columns:
        x, y = a[c], b[c]
        if np.issubdtype(x.dtype, np.floating) or np.issubdtype(y.dtype, np.floating):
            xv = x.astype(float).values
            yv = y.astype(float).values
            same = (xv == yv) | (np.isnan(xv) & np.isnan(yv))
            if not same.all():
                close = np.isclose(xv, yv, rtol=0, atol=1e-9, equal_nan=True)
                if close.all():
                    exact = False
                else:
                    i = int(np.argmin(close))
                    return False, f"col {c} row {i}: spark={xv[i]!r} oracle={yv[i]!r}"
        else:
            if not x.equals(y):
                neq = x.values != y.values
                i = int(np.argmax(neq))
                return False, f"col {c} row {i}: spark={x.values[i]!r} oracle={y.values[i]!r}"
    return True, ("" if exact else " [float-atol]")

if __name__ == "__main__":
    main()
