"""jdbc()-analog DB-API source: type mapping + partitioned scan
(JDBCStream.java:1), exercised against stdlib sqlite3."""

import datetime
import os
import sqlite3
import tempfile

import pytest

from solr_spark.sources.dbapi import (
    infer_schema,
    partition_predicates,
    read_dbapi,
    read_dbapi_partitioned,
)


@pytest.fixture(scope="module")
def db_path():
    fd, path = tempfile.mkstemp(suffix=".db")
    os.close(fd)
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE t (id INTEGER, price REAL, name TEXT, blob BLOB, "
        "ts TEXT)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?,?,?,?,?)",
        [
            (i, i * 1.5, f"row{i}", bytes([i % 256]), f"2026-01-{i % 28 + 1:02d}")
            for i in range(100)
        ],
    )
    con.execute("INSERT INTO t VALUES (NULL, NULL, NULL, NULL, NULL)")
    con.commit()
    con.close()
    yield path
    os.unlink(path)


def test_infer_schema_type_mapping():
    rows = [(None, None), (1, None), (2, b"\x00")]
    sch = infer_schema(["a", "b"], rows)
    assert sch["a"].dataType.typeName() == "long"
    assert sch["b"].dataType.typeName() == "binary"
    # all-null column degrades to string
    sch2 = infer_schema(["x"], [(None,), (None,)])
    assert sch2["x"].dataType.typeName() == "string"
    sch3 = infer_schema(
        ["d", "t", "f", "s"],
        [(datetime.date(2026, 1, 1), datetime.datetime(2026, 1, 1, 2),
          2.5, "z")],
    )
    assert [f.dataType.typeName() for f in sch3.fields] == [
        "date", "timestamp", "double", "string"]


def test_read_dbapi(spark, db_path):
    df = read_dbapi(spark, lambda: sqlite3.connect(db_path),
                    "SELECT id, price, name FROM t WHERE id < 10")
    rows = df.orderBy("id").collect()
    assert len(rows) == 10
    assert rows[3]["id"] == 3 and rows[3]["price"] == 4.5
    assert rows[3]["name"] == "row3"
    assert df.schema["id"].dataType.typeName() == "long"
    assert df.schema["price"].dataType.typeName() == "double"


def test_partition_predicates_cover_all():
    preds = partition_predicates("id", 0, 100, 4)
    assert len(preds) == 4
    assert "IS NULL" in preds[0]
    assert preds[-1] == "id >= 75"


def test_read_dbapi_partitioned(spark, db_path):
    df = read_dbapi_partitioned(
        spark, lambda: sqlite3.connect(db_path), "t",
        partition_column="id", lower=0, upper=100, num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == 101  # 100 + the all-NULL row (captured by part 0)
    got = sorted(r["id"] for r in rows if r["id"] is not None)
    assert got == list(range(100))
    # every partition carries rows (the ranges really fan out)
    sizes = df.rdd.glom().map(len).collect()
    assert all(s > 0 for s in sizes)


def test_partitioned_probe_survives_leading_nulls(spark):
    """Schema probe must not type a column from a single row: here the
    first 50 rows have NULL price/name, so a LIMIT-1 probe would call
    them strings and the Arrow conversion of later float rows would
    break."""
    fd, path = tempfile.mkstemp(suffix=".db")
    os.close(fd)
    try:
        con = sqlite3.connect(path)
        con.execute("CREATE TABLE n (id INTEGER, price REAL, name TEXT)")
        con.executemany(
            "INSERT INTO n VALUES (?,?,?)",
            [(i, None, None) for i in range(50)]
            + [(i, i * 0.5, f"r{i}") for i in range(50, 100)],
        )
        con.commit()
        con.close()
        df = read_dbapi_partitioned(
            spark, lambda: sqlite3.connect(path), "n",
            partition_column="id", lower=0, upper=100, num_partitions=4,
        )
        assert dict(df.dtypes)["price"] == "double"
        rows = df.collect()
        assert len(rows) == 100
        assert sum(1 for r in rows if r["price"] is not None) == 50
    finally:
        os.unlink(path)
