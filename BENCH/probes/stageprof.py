import sys, time
from pyspark.sql import functions as F
from duplicatesuricate_spark import get_spark, DEFAULT_CONFIG as cfg
from duplicatesuricate_spark.sources.corpus import with_doc_identity
from duplicatesuricate_spark.operators.dedup import exact_dup_edges
from duplicatesuricate_spark.functions.text import with_shingles
from duplicatesuricate_spark.functions.sketch import with_sketches
from duplicatesuricate_spark.functions.util import ensure_min_partitions
from duplicatesuricate_spark.operators.lsh import band_explode, candidate_pairs, simhash_block_explode
from duplicatesuricate_spark.operators.score import score_and_verify
from duplicatesuricate_spark.operators.substring import exact_substring_pairs
from duplicatesuricate_spark.operators.components import connected_components
cores = int(sys.argv[1])
spark = get_spark(cores=cores)
corpus = with_doc_identity(spark.read.parquet("/root/repo/BENCH/data/corpus100000.parquet"))
corpus.count()
out=[]
def t(name, fn):
    t0=time.monotonic(); r=fn(); out.append(f"{name}={time.monotonic()-t0:.1f}s({r})")
reps, exact_edges = exact_dup_edges(corpus)
t("exact", lambda: exact_edges.count())
reps = ensure_min_partitions(reps)
sk = with_sketches(with_shingles(reps, cfg=cfg), cfg=cfg).select("doc_id","content_sha256","shingles","minhash","simhash").persist()
t("sketch", lambda: sk.count())
bands = band_explode(sk, cfg).unionByName(simhash_block_explode(sk, cfg))
cands = candidate_pairs(bands, cfg)
t("cands", lambda: cands.count())
ver = score_and_verify(cands, sk, cfg).persist()
t("scoreverify", lambda: ver.count())
t("substring", lambda: exact_substring_pairs(reps, cfg).count())
t("cc", lambda: connected_components(ver.select("id_a","id_b")).count())
print(f"cores={cores} " + " ".join(out))
spark.stop()
