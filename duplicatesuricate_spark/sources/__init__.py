from duplicatesuricate_spark.sources.corpus import (
    CORPUS_COLUMNS,
    read_corpus,
    resolve_id_collisions,
    with_doc_identity,
)
from duplicatesuricate_spark.sources.sinks import IcebergUnavailableError, require_iceberg
from duplicatesuricate_spark.sources.synth import (
    planted_truth,
    synth_corpus,
    synth_hot_mixed_corpus,
)

__all__ = [
    "read_corpus",
    "resolve_id_collisions",
    "with_doc_identity",
    "CORPUS_COLUMNS",
    "IcebergUnavailableError",
    "require_iceberg",
    "synth_corpus",
    "synth_hot_mixed_corpus",
    "planted_truth",
]
