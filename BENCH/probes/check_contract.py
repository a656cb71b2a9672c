#!/usr/bin/env python
"""Local stand-in for the driver's CORRECTNESS harness.

Runs every __spark_entry__.queries() entry at the given sf dir; queries
with an oracle_sql() entry are compared to DuckDB on rows / schema /
canonicalized values (columns sorted by name, floats rounded to 6dp,
rows sorted); the rest print row counts (rows-only).

Usage: PYTHONPATH=/root/repo python BENCH/probes/check_contract.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from duplicatesuricate_spark import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="contract-check", cores=8)
    con = duckdb.connect()
    import os

    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")

    qs, oracles = E.queries(), E.oracle_sql()
    failed = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"{name:28s} ERROR {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only  spark_rows={len(sdf)}")
            continue
        odf = con.execute(oracles[name]).df()
        s, o = canon(sdf), canon(odf)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        values = rows and schema and s.astype(str).equals(o.astype(str))
        ok = rows and schema and values
        print(f"{name:28s} rows={len(s)}/{len(o)} schema={schema} "
              f"values={values}  {'OK' if ok else 'FAIL'}")
        if not ok:
            failed.append(name)
            if rows and schema:
                for c in s.columns:
                    if not s[c].astype(str).equals(o[c].astype(str)):
                        print(f"  first col mismatch: {c}")
                        break
    spark.stop()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all oracle-backed queries OK")


if __name__ == "__main__":
    main()
