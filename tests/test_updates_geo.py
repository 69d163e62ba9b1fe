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
