import time
from pyspark.sql import functions as F
from duplicatesuricate_spark import get_spark, DEFAULT_CONFIG as cfg
from duplicatesuricate_spark.sources.corpus import with_doc_identity
from duplicatesuricate_spark.functions.util import ensure_min_partitions
from duplicatesuricate_spark.operators.substring import chunk_hashes, substring_candidates, verify_containment
spark = get_spark(cores=32)
corpus = ensure_min_partitions(with_doc_identity(spark.read.parquet("/root/repo/BENCH/data/corpus100000.parquet"))).persist()
corpus.count()
def t(name, fn):
    t0=time.monotonic(); r=fn(); print(f"{name}: {time.monotonic()-t0:.1f}s -> {r}")
ch = chunk_hashes(corpus, cfg).persist()
t("chunk_gen", lambda: ch.count())
cands = substring_candidates(corpus, cfg).persist()
t("candidates(full incl regen)", lambda: cands.count())
t("verify", lambda: verify_containment(cands, corpus, cfg).count())
spark.stop()
