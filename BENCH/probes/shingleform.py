import sys, time
from pyspark.sql import functions as F
from duplicatesuricate_spark import get_spark
cores = int(sys.argv[1])
spark = get_spark(cores=cores)
d = spark.read.parquet("/root/repo/BENCH/data/corpus100000.parquet")
d.count()
toks_df = d.select(F.filter(F.split(F.lower("content"), "[^a-z0-9_]+"), lambda t: t != F.lit("")).alias("toks"))
def run(name, expr_fn):
    df = toks_df.withColumn("sh", expr_fn(F.col("toks")))
    t0=time.monotonic(); n = df.agg(F.sum(F.size("sh"))).collect()[0][0]
    print(f"cores={cores} {name}: {time.monotonic()-t0:.1f}s n={n}")
k=5
def old(toks):
    n = F.size(toks)
    return F.array_distinct(F.when(n >= k, F.transform(F.sequence(F.lit(1), n - F.lit(k-1)),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, k))))).otherwise(F.array(F.xxhash64(F.concat_ws(" ", toks)))))
def new(toks):
    n = F.size(toks)
    return F.array_distinct(F.when(n >= k, F.transform(F.sequence(F.lit(1), n - F.lit(k-1)),
        lambda i: F.xxhash64(*[F.element_at(toks, i + j) for j in range(k)]))).otherwise(F.array(F.xxhash64(F.concat_ws(" ", toks)))))
run("old_concat", old)
run("new_elementat", new)
run("new_again", new)
spark.stop()
