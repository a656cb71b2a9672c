from duplicatesuricate_spark.functions.text import with_tokens, with_shingles
from duplicatesuricate_spark.functions.sketch import with_sketches, minhash_simhash_py

__all__ = ["with_tokens", "with_shingles", "with_sketches", "minhash_simhash_py"]
