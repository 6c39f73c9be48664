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
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    # driver sorts columns by name before hashing
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)


def norm_type(t: pa.DataType) -> str:
    """Collapse representation-only arrow differences (large_string vs
    string, dictionary encoding) but keep semantic ones (int64 vs
    decimal128) — the driver's hash is typed, so those must be red."""
    if pa.types.is_dictionary(t):
        t = t.value_type
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"  # unit/tz are writer artifacts, values compared below
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{norm_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{norm_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def cmp_types(spark_tbl: pa.Table, oracle_tbl: pa.Table):
    st = {f.name: norm_type(f.type) for f in spark_tbl.schema}
    ot = {f.name: norm_type(f.type) for f in oracle_tbl.schema}
    for c in sorted(set(st) & set(ot)):
        if st[c] != ot[c]:
            return f"TYPE col={c} spark={st[c]} oracle={ot[c]}"
    return None


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
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
            spark_df = spark_tbl.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            bad += 1
            continue
        try:
            oracle_tbl = con.sql(sql).arrow()
            oracle_df = oracle_tbl.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            bad += 1
            continue
        err = cmp_types(spark_tbl, oracle_tbl) or \
            cmp_frames(name, spark_df, oracle_df)
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
