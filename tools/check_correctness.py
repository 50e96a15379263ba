"""Self-check harness mirroring the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet, then compares row count, column names/dtypes,
and order-insensitive values. Usage::

    python tools/check_correctness.py [--sf /root/testdata/sf0.01] [keys...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        else:
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"columns: spark={sc} oracle={oc}")
        return problems
    a, b = canon(spark_df), canon(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            if a[c].dtype != b[c].dtype:
                problems.append(f"dtype[{c}]: spark={a[c].dtype} oracle={b[c].dtype}")
        neq = ~(a.eq(b) | (a.isna() & b.isna()))
        bad = neq.any(axis=1)
        if bad.any():
            idx = list(a.index[bad][:3])
            problems.append(
                f"{int(bad.sum())} mismatched rows; first diffs:\n"
                f"spark:\n{a.loc[idx]}\noracle:\n{b.loc[idx]}"
            )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from map_reduce_in_go_spark.session import get_spark

    spark = get_spark("check-correctness")
    qs, oracles = e.queries(), e.oracle_sql()
    keys = args.keys or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    failures = 0
    for k in keys:
        t0 = time.time()
        try:
            sdf = qs[k](spark, args.sf).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {k}: spark error: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if k not in oracles:
            print(f"ROWS  {k}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[k]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {k}: oracle error: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        problems = compare(k, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL  {k} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"PASS  {k}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(keys) - failures}/{len(keys)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
