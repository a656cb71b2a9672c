import sys, time
import duckdb
import pandas as pd
import __spark_entry__ as E
from duplicatesuricate_spark import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark(cores=8)
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")

qs, os_ = E.queries(), E.oracle_sql()
fails = []
for name, fn in qs.items():
    t0 = time.time()
    try:
        sdf = fn(spark, SF)
        spdf = sdf.toPandas()
    except Exception as e:
        print(f"{name}: SPARK ERROR {str(e)[:200]}")
        fails.append(name); continue
    if name not in os_:
        print(f"{name}: rows-only, {len(spdf)} rows, {round(time.time()-t0,1)}s")
        continue
    try:
        opdf = con.execute(os_[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {str(e)[:200]}")
        fails.append(name); continue
    ok = True
    if sorted(spdf.columns) != sorted(opdf.columns):
        print(f"{name}: SCHEMA MISMATCH {sorted(spdf.columns)} vs {sorted(opdf.columns)}"); ok = False
    elif len(spdf) != len(opdf):
        print(f"{name}: ROWCOUNT {len(spdf)} vs {len(opdf)}"); ok = False
    else:
        cols = sorted(spdf.columns)
        a = spdf[cols].sort_values(cols).reset_index(drop=True)
        b = opdf[cols].sort_values(cols).reset_index(drop=True)
        for c in cols:
            if a[c].dtype != b[c].dtype:
                try:
                    b[c] = b[c].astype(a[c].dtype)
                except Exception: pass
        if not a.equals(b):
            diff = (a != b) & ~(a.isna() & b.isna())
            ndiff = int(diff.any(axis=1).sum())
            print(f"{name}: VALUE MISMATCH in {ndiff}/{len(a)} rows; cols: {[c for c in cols if diff[c].any()]}")
            mask = diff.any(axis=1)
            print(a[mask].head(3)); print(b[mask].head(3))
            ok = False
    if ok:
        print(f"{name}: OK ({len(spdf)} rows, {round(time.time()-t0,1)}s)")
    else:
        fails.append(name)
print("FAILS:", fails)
spark.stop()
