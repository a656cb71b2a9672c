import time
from duplicatesuricate_spark import get_spark, DEFAULT_CONFIG as cfg
from duplicatesuricate_spark.sources.corpus import with_doc_identity
from duplicatesuricate_spark.functions.util import ensure_min_partitions
from duplicatesuricate_spark.operators.substring import exact_substring_pairs
spark = get_spark(cores=32)
corpus = ensure_min_partitions(with_doc_identity(spark.read.parquet("/root/repo/BENCH/data/corpus100000.parquet")))
t0=time.monotonic(); n = exact_substring_pairs(corpus, cfg).count()
print(f"substring: {time.monotonic()-t0:.1f}s pairs={n}")
spark.stop()
