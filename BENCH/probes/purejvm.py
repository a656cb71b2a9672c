import sys, time
from pyspark.sql import functions as F
from duplicatesuricate_spark import get_spark
cores = int(sys.argv[1])
spark = get_spark(cores=cores)
df = spark.range(0, 2_000_000_000, 1, cores * 2)
df.agg(F.sum("id")).collect()  # warm
t0=time.monotonic()
r = df.agg(F.bit_xor(F.xxhash64("id"))).collect()[0][0]
print(f'{{"cores":{cores},"xxhash_2e9_s":{time.monotonic()-t0:.1f}}}')
spark.stop()
