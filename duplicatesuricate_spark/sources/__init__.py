from duplicatesuricate_spark.sources.corpus import read_corpus, with_doc_identity, CORPUS_COLUMNS
from duplicatesuricate_spark.sources.synth import synth_corpus, planted_truth

__all__ = [
    "read_corpus",
    "with_doc_identity",
    "CORPUS_COLUMNS",
    "synth_corpus",
    "planted_truth",
]
