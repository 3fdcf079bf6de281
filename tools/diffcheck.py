#!/usr/bin/env python3
"""Local differential check: Spark (graft.Verify output) vs DuckDB oracle.

Dev-only tooling (mimics the driver's correctness gate): the engine itself
is pure Scala/Spark; this script just validates oracle parity before commit.

Usage: python3 tools/diffcheck.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        na_position="first")
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame):
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"COLS spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            xnan = isinstance(x, float) and math.isnan(x)
            ynan = isinstance(y, float) and math.isnan(y)
            if (x is None and ynan) or (y is None and xnan) or (xnan and ynan):
                continue
            if isinstance(x, float) and isinstance(y, float):
                if x != y:
                    return (f"VAL col={c} row={i} spark={x!r} oracle={y!r} "
                            f"delta={x-y!r}")
            elif str(x) != str(y):
                return f"VAL col={c} row={i} spark={x!r} oracle={y!r}"
    # dtype note (non-fatal)
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            return f"OK (dtype note: {c} spark={a[c].dtype} oracle={b[c].dtype})"
    return "OK"


def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results = {}
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in qdir.glob("*.parquet")],
                ignore_index=True)
        except Exception as e:
            results[name] = f"SPARK READ FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only: {len(spark_df)} rows"
            continue
        try:
            oracle_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE SQL FAIL {str(e)[:200]}"
            continue
        try:
            results[name] = compare(name, spark_df, oracle_df)
        except Exception as e:
            results[name] = f"COMPARE FAIL {str(e)[:200]}"
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if str(v).startswith(("OK", "rows-only")))
    for k in sorted(results):
        print(f"{k:<{width}}  {results[k]}")
    print(f"\n{n_ok}/{len(results)} OK")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
