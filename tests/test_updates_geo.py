"""Atomic-update merge semantics + spatial filters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.functions.geo import bbox, geofilt, haversine_km
from solr_spark.operators.updates import atomic_update, delete_by_key, delete_by_query


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0, ["x"]), (2, "b", 20.0, ["x", "y"]), (3, "c", 30.0, [])],
        "id bigint, s string, v double, arr array<string>",
    )


def test_atomic_set_inc_add_remove(spark, base):
    updates = spark.createDataFrame(
        [(1, "A", 5.0, "z"), (2, None, None, "y")],
        "id bigint, s string, v double, arr string",
    )
    out = atomic_update(
        base, updates, "id",
        {"s": "set", "v": "inc", "arr": "remove"},
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["s"] == "A" and by_id[1]["v"] == 15.0 and by_id[1]["arr"] == ["x"]
    # null update fields keep old values (set) / no-op (inc); the non-null
    # arr update removes its value
    assert by_id[2]["s"] == "b" and by_id[2]["v"] == 20.0 and by_id[2]["arr"] == ["x"]
    # unmatched rows pass through
    assert by_id[3]["s"] == "c" and by_id[3]["v"] == 30.0


def test_atomic_add_distinct(spark, base):
    updates = spark.createDataFrame(
        [(1, "x"), (2, "z")], "id bigint, arr string"
    )
    out = atomic_update(base, updates, "id", {"arr": "add-distinct"}).collect()
    by_id = {r["id"]: r["arr"] for r in out}
    assert by_id[1] == ["x"]            # already present -> unchanged
    assert by_id[2] == ["x", "y", "z"]  # appended


def test_delete_ops(spark, base):
    keys = spark.createDataFrame([(2,)], "id bigint")
    assert {r["id"] for r in delete_by_key(base, keys, "id").collect()} == {1, 3}
    left = delete_by_query(base, F.col("v") >= 20.0)
    assert {r["id"] for r in left.collect()} == {1}


def test_haversine_known_distance(spark):
    # Paris (48.8566, 2.3522) -> London (51.5074, -0.1278) ≈ 343.5 km
    df = spark.range(1).select(
        haversine_km(
            F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278)
        ).alias("d")
    )
    d = df.collect()[0]["d"]
    assert abs(d - 343.5) < 1.0


def test_geofilt_bbox(spark):
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 1.0, 1.0), (3, 50.0, 50.0)],
        "id bigint, lat double, lon double",
    )
    near = geofilt(pts, "lat", "lon", 0.0, 0.0, 200.0)
    assert {r["id"] for r in near.collect()} == {1, 2}
    boxed = bbox(pts, "lat", "lon", -2.0, 2.0, -2.0, 2.0)
    assert {r["id"] for r in boxed.collect()} == {1, 2}


# ---------------------------------------------------------------------------
# DateRangeField ranges-as-values (functions/daterange.py)

def test_parse_daterange_truncation():
    from datetime import datetime

    from solr_spark.functions.daterange import parse_daterange

    # bare truncated instants widen to the full implicit range
    assert parse_daterange("2020") == (
        datetime(2020, 1, 1), datetime(2020, 12, 31, 23, 59, 59, 999000))
    assert parse_daterange("2020-02") == (
        datetime(2020, 2, 1), datetime(2020, 2, 29, 23, 59, 59, 999000))
    assert parse_daterange("2020-06-15") == (
        datetime(2020, 6, 15), datetime(2020, 6, 15, 23, 59, 59, 999000))
    assert parse_daterange("2020-06-15T10") == (
        datetime(2020, 6, 15, 10), datetime(2020, 6, 15, 10, 59, 59, 999000))
    # bracket ranges expand each side independently; * is open-ended
    lo, hi = parse_daterange("[2019-11 TO 2020]")
    assert lo == datetime(2019, 11, 1)
    assert hi == datetime(2020, 12, 31, 23, 59, 59, 999000)
    lo, hi = parse_daterange("[* TO 2020-01-01]")
    assert lo.year == 1 and hi == datetime(2020, 1, 1, 23, 59, 59, 999000)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_daterange("[2020 2021]")
    with _pytest.raises(ValueError):
        parse_daterange("not-a-date")


def test_daterange_ops(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from solr_spark.functions.daterange import (
        date_range, dr_contains, dr_intersects, dr_within)

    rows = [
        (1, datetime(2020, 1, 1), datetime(2020, 12, 31)),   # contains Q
        (2, datetime(2020, 6, 1), datetime(2020, 6, 10)),    # within Q
        (3, datetime(2020, 5, 1), datetime(2020, 6, 5)),     # overlaps left
        (4, datetime(2021, 1, 1), datetime(2021, 2, 1)),     # disjoint
    ]
    df = spark.createDataFrame(rows, "id int, s timestamp, e timestamp") \
        .select("id", date_range("s", "e").alias("r"))
    q = "[2020-06 TO 2020-06]"  # the whole of June 2020
    got = df.select(
        "id",
        dr_intersects(F.col("r"), q).alias("i"),
        dr_contains(F.col("r"), q).alias("c"),
        dr_within(F.col("r"), q).alias("w"),
    ).orderBy("id").collect()
    assert [(r["i"], r["c"], r["w"]) for r in got] == [
        (True, True, False),
        (True, False, True),
        (True, False, False),
        (False, False, False),
    ]
