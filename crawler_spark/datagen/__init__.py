from crawler_spark.datagen.webgen import (
    CorpusSpec,
    corpus_rows,
    default_robots,
    default_seeds,
    write_corpus,
)

__all__ = ["CorpusSpec", "corpus_rows", "write_corpus", "default_seeds", "default_robots"]
