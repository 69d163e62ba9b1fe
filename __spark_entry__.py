"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in solr_spark.gate (one entry per operator row of
SURVEY.md §2 plus the training-data pipeline ops); this file stays a thin
adapter so the driver can import it from any cwd.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-10 over the sf0.001 documents corpus via
    the full index pipeline (tokenize → postings → term stats → block-max
    scored top-k)."""
    from solr_spark.engine import gate_search
    from solr_spark.session import ship_package

    ship_package(spark)
    return gate_search(spark, "/root/testdata/sf0.001", "spark window merge", 10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from solr_spark import gate
    from solr_spark.session import ship_package

    base = gate.all_queries()

    def wrap(fn):
        def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
            ship_package(spark)  # idempotent; needed for mapInPandas closures
            return fn(spark, sf_dir)

        return inner

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    from solr_spark import gate

    return gate.all_oracles()
