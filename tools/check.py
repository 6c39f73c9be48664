#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the oracle SQL from oracle_sql.json
in DuckDB over the same testdata tables and compare (schema, rows,
values). Dev tool only — the shipped library is pure Scala/Spark.

Usage: tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    # driver sorts columns by name before hashing
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)


def cmp_frames(name, spark_df, oracle_df):
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"COLS spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"NROWS spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        for i in range(len(a)):
            x, y = av.iloc[i], bv.iloc[i]
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn or yn:
                if xn != yn:
                    return f"NULL-MISMATCH col={c} row={i} spark={x} oracle={y}"
                continue
            if isinstance(x, float) or isinstance(y, float):
                if x != y:  # exact — the driver hashes, so exact is the bar
                    return f"FLOAT col={c} row={i} spark={x!r} oracle={y!r}"
            else:
                if str(x) != str(y):
                    return f"VAL col={c} row={i} spark={x!r} oracle={y!r}"
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = sys.argv[3:] or None
    ok = bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            bad += 1
            continue
        try:
            oracle_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            bad += 1
            continue
        err = cmp_frames(name, spark_df, oracle_df)
        if err:
            print(f"FAIL {name}: {err}")
            bad += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
            ok += 1
    print(f"\n{ok} ok, {bad} failed")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
