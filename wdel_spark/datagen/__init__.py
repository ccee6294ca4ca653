from wdel_spark.datagen.corpus import (
    CorpusConfig,
    gen_entity,
    gen_document,
    gen_kb_pandas,
    gen_documents_pandas,
    gen_labeled_pairs_pandas,
    gen_corpus_spark,
    DOCUMENTS_SCHEMA,
)

__all__ = [
    "CorpusConfig",
    "gen_entity",
    "gen_document",
    "gen_kb_pandas",
    "gen_documents_pandas",
    "gen_labeled_pairs_pandas",
    "gen_corpus_spark",
    "DOCUMENTS_SCHEMA",
]
