from crawler_spark.datagen.webgen import (
    CorpusSpec,
    corpus_rows,
    corpus_spark_df,
    default_robots,
    default_seeds,
    write_corpus,
    write_corpus_spark,
)

__all__ = [
    "CorpusSpec",
    "corpus_rows",
    "corpus_spark_df",
    "write_corpus",
    "write_corpus_spark",
    "default_seeds",
    "default_robots",
]
