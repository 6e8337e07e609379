#!/usr/bin/env python3
"""Local mimic of the driver's t2 DuckDB-oracle compare.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/, runs the
matching SQL from oracle_sql.json in DuckDB (tables = views over
<sfDir>/*.parquet) and compares: schema (column names sorted), row count,
and values (rows sorted by all columns, doubles compared to 1e-9).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def load_result(d):
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def canon(df):
    df = df[sorted(df.columns)].copy()
    # normalize for sorting: NaN-safe
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def compare(name, spark_df, oracle_df):
    problems = []
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        return [f"SCHEMA cols spark={sc} oracle={oc}"]
    if len(spark_df) != len(oracle_df):
        problems.append(f"ROWS spark={len(spark_df)} oracle={len(oracle_df)}")
        return problems
    a, b = canon(spark_df), canon(oracle_df)
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True)
        else:
            try:
                ok = (av.astype(object).values == bv.astype(object).values).all()
            except Exception:
                ok = False
        if not ok:
            mism = None
            try:
                if av.dtype.kind == "f":
                    idx = np.where(~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True))[0]
                else:
                    idx = np.where(av.astype(object).values != bv.astype(object).values)[0]
                if len(idx):
                    i = idx[0]
                    mism = f"row {i}: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r} ({len(idx)} diffs)"
            except Exception as e:
                mism = f"(diff detail failed: {e})"
            problems.append(f"VALUES col {col}: {mism}")
        # dtype note (schema-ish)
        if av.dtype != bv.dtype:
            problems.append(f"DTYPE col {col}: spark={av.dtype} oracle={bv.dtype}")
    return problems

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)))
    npass = nfail = nskip = 0
    for name in names:
        spark_df = load_result(os.path.join(out_dir, name))
        if spark_df is None:
            print(f"FAIL {name}: no spark result parquet"); nfail += 1; continue
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({len(spark_df)} rows)"); nskip += 1; continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); nfail += 1; continue
        problems = compare(name, spark_df, odf)
        if problems:
            print(f"FAIL {name}:")
            for p in problems: print(f"   {p}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)"); npass += 1
    print(f"\n{npass} pass, {nfail} fail, {nskip} rows-only")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
