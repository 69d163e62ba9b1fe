"""Real Spark-JDBC code path (sources.read_jdbc) exercised end-to-end
against embedded Apache Derby — the JDBC driver that ships inside
Spark's own jars, so the test runs fully in-JVM with no network.
Closes the round-3 gap where read_jdbc was an untested passthrough
(reference: STREAM/JDBCStream.java:1); the DB-API 2.0 analog with type
mapping stays covered by tests/test_dbapi.py."""

import shutil

import pytest

from solr_spark.sources import read_jdbc

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("derby")
    url = f"jdbc:derby:{base}/db;create=true"
    df = spark.createDataFrame(
        [(i, f"v{i}", float(i) * 1.5) for i in range(1, 21)],
        "id bigint, name string, score double",
    )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "probe")
        .option("driver", DERBY)
        .mode("overwrite")
        .save()
    )
    yield url
    shutil.rmtree(base, ignore_errors=True)


def test_read_jdbc_roundtrip(spark, derby_url):
    back = read_jdbc(spark, derby_url, "probe", driver=DERBY)
    rows = sorted((int(r[0]), r[1], float(r[2])) for r in back.collect())
    assert rows == [(i, f"v{i}", i * 1.5) for i in range(1, 21)]
    # Derby upper-cases unquoted identifiers; the Spark-JDBC schema
    # reflects the JDBC metadata, types mapped back to Catalyst
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "bigint", "string", "double",
    ]


def test_read_jdbc_partitioned_range_scan(spark, derby_url):
    """The (partitionColumn, lowerBound, upperBound, numPartitions)
    splitting contract — each partition issues its own range-bounded
    query, the union is exactly the table."""
    part = read_jdbc(
        spark, derby_url, "probe", driver=DERBY,
        partitionColumn="id", lowerBound="1", upperBound="21",
        numPartitions="4",
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 20
    assert sorted(int(r[0]) for r in part.collect()) == list(range(1, 21))


def test_read_jdbc_dbtable_subquery_pushdown(spark, derby_url):
    """dbtable can be a derived table — the WHERE runs inside the
    database, mirroring JDBCStream's pass-the-SQL-through contract.
    (Spark's JDBC writer creates QUOTED lowercase identifiers, so the
    hand-written subquery must quote them for Derby too.)"""
    sub = read_jdbc(
        spark, derby_url,
        '(SELECT "id", "score" FROM probe WHERE "id" <= 5) s',
        driver=DERBY,
    )
    assert sorted(int(r[0]) for r in sub.collect()) == [1, 2, 3, 4, 5]
