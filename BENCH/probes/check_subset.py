#!/usr/bin/env python
"""check_contract.py restricted to named queries: quick oracle spot-checks
while iterating.  Usage: check_subset.py <sf_dir> q1 q2 ..."""
from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from duplicatesuricate_spark import get_spark  # noqa: E402
from BENCH.probes.check_contract import TABLES, canon  # noqa: E402


def main() -> None:
    sf = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="contract-subset", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    qs, oracles = E.queries(), E.oracle_sql()
    failed = []
    for name in names:
        sdf = qs[name](spark, sf).toPandas()
        odf = con.execute(oracles[name]).df()
        s, o = canon(sdf), canon(odf)
        ok = (len(s) == len(o) and list(s.columns) == list(o.columns)
              and s.astype(str).equals(o.astype(str)))
        print(f"{name:28s} rows={len(s)}/{len(o)} {'OK' if ok else 'FAIL'}")
        if not ok:
            failed.append(name)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
