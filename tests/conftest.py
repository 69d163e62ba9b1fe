import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from solr_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="solr_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def small_corpus(spark, tmp_path_factory):
    """Deterministic 600-doc synthetic corpus, materialized once."""
    from solr_spark.corpus import materialize_corpus

    p = str(tmp_path_factory.mktemp("corpus") / "docs.parquet")
    materialize_corpus(spark, 600, p, num_partitions=4)
    return p


@pytest.fixture(scope="session")
def small_index(spark, small_corpus, tmp_path_factory):
    from solr_spark.indexer import build_index

    out = str(tmp_path_factory.mktemp("index") / "idx")
    meta = build_index(
        spark, spark.read.parquet(small_corpus), out, bucket_docs=256, num_partitions=4
    )
    return meta
