import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from crawler_spark.session import build_session

    spark = build_session(master="local[4]", app_name="crawler_spark_tests",
                          shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def corpus_spec():
    from crawler_spark.datagen import CorpusSpec

    return CorpusSpec(n_pages=120, n_hosts=6, seed=42)


@pytest.fixture(scope="session")
def corpus_parquet(tmp_path_factory, corpus_spec):
    from crawler_spark.datagen import write_corpus

    path = str(tmp_path_factory.mktemp("corpus") / "pages.parquet")
    write_corpus(path, corpus_spec)
    return path


@pytest.fixture(scope="session")
def corpus_rows_mem(corpus_spec):
    from crawler_spark.datagen import corpus_rows

    return corpus_rows(corpus_spec)


@pytest.fixture(scope="session")
def corpus_dict(corpus_rows_mem):
    return {r["url"]: r["html"] for r in corpus_rows_mem}


@pytest.fixture(scope="session")
def corpus_ts(corpus_rows_mem):
    return {r["url"]: r["warc_ts"].isoformat() for r in corpus_rows_mem}
