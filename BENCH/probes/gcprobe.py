import sys, time
from pyspark.sql import functions as F
from duplicatesuricate_spark import get_spark
cores, gc = int(sys.argv[1]), sys.argv[2]
opts = {"parallel": "-XX:+UseParallelGC", "g1": "-XX:+UseG1GC", "zgc": "-XX:+UseZGC -XX:+ZGenerational"}[gc]
spark = get_spark(cores=cores, extra_conf={"spark.driver.extraJavaOptions": opts})
d = spark.read.parquet("/root/repo/BENCH/data/corpus100000.parquet")
d.count()
toks_df = d.select(F.filter(F.split(F.lower("content"), "[^a-z0-9_]+"), lambda t: t != F.lit("")).alias("toks"))
k=5
def new(toks):
    n = F.size(toks)
    return F.array_distinct(F.when(n >= k, F.transform(F.sequence(F.lit(1), n - F.lit(k-1)),
        lambda i: F.xxhash64(*[F.element_at(toks, i + j) for j in range(k)]))).otherwise(F.array(F.xxhash64(F.concat_ws(" ", toks)))))
df = toks_df.withColumn("sh", new(F.col("toks")))
for it in range(2):
    t0=time.monotonic(); n = df.agg(F.sum(F.size("sh"))).collect()[0][0]
    print(f"cores={cores} gc={gc} iter{it}: {time.monotonic()-t0:.1f}s")
spark.stop()
