from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from tlhop_library_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_path(tmp_path_factory):
    from tlhop_library_spark.corpus import write_corpus_parquet

    p = tmp_path_factory.mktemp("corpus") / "documents.parquet"
    write_corpus_parquet(str(p), n_docs=800)
    return str(p)


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_path):
    return spark.read.parquet(corpus_path)


@pytest.fixture(scope="session")
def index_dir(spark, corpus_df, tmp_path_factory):
    from tlhop_library_spark.index.build import IndexBuilder

    d = str(tmp_path_factory.mktemp("index") / "idx")
    IndexBuilder(spark, d, n_buckets=8, n_ranges=8, n_jobs=2).build(corpus_df)
    return d


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
