import sys, time
from pyspark.sql import functions as F
from duplicatesuricate_spark import get_spark, DEFAULT_CONFIG as cfg
from duplicatesuricate_spark.functions.sketch import with_full_sketches
cores = int(sys.argv[1])
spark = get_spark(cores=cores)
d = spark.read.parquet("/root/repo/BENCH/data/corpus100000.parquet").withColumnRenamed("text","content")
d.count()
df = with_full_sketches(d, cfg=cfg)
for it in range(2):
    t0=time.monotonic(); n = df.agg(F.sum(F.size("shingles")), F.sum(F.size("minhash"))).collect()[0]
    print(f"cores={cores} iter{it}: {time.monotonic()-t0:.1f}s shingles={n[0]}")
spark.stop()
