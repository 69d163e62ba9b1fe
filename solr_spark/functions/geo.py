"""Spatial functions: great-circle distance + radius/bbox filters.

Reference analog (/root/reference/solr/):
- geodist()/geofilt/bbox: core/.../search/SpatialFilterQParserPlugin.java:1,
  core/.../schema/LatLonPointSpatialField.java, function registry entries
  'geodist'/'hsin' in core/.../search/ValueSourceParser.java (:458 geodist).

Pure Catalyst trig expressions (JVM libm) — the haversine formula written
in one fixed shape so a SQL oracle can mirror it term for term.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0087714  # mean Earth radius, same constant as Solr's


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (geodist()/hsin function query).

    Shape: 2*R*asin(least(1, sqrt(sin^2(dphi/2) +
    cos(phi1)*cos(phi2)*sin^2(dlmb/2)))) evaluated left-to-right — mirror
    this exactly in oracle SQL. The least(1, …) clamp matters: for
    near-antipodal points double rounding pushes the radicand a few ulps
    above 1 and an unclamped asin returns NaN (the reference clamps the
    same way — Lucene SloppyMath.haversinMeters' min(1, sqrt(h)))."""
    phi1, phi2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(phi1) * F.cos(phi2) * F.sin(dlmb / 2) * F.sin(dlmb / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


HAVERSINE_SQL = (
    "2.0 * {R} * asin(least(1.0, sqrt("
    "sin(radians({lat2} - {lat1}) / 2) * sin(radians({lat2} - {lat1}) / 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * sin(radians({lon2} - {lon1}) / 2) * sin(radians({lon2} - {lon1}) / 2))))"
)


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The identical formula as a SQL fragment (DuckDB/Spark SQL)."""
    return HAVERSINE_SQL.format(
        R=EARTH_RADIUS_KM, lat1=lat1, lon1=lon1, lat2=lat2, lon2=lon2
    )


def geofilt(
    df: DataFrame, lat_col: str, lon_col: str, lat0: float, lon0: float, d_km: float
) -> DataFrame:
    """{!geofilt}: great-circle radius filter."""
    return df.filter(
        haversine_km(F.col(lat_col), F.col(lon_col), F.lit(lat0), F.lit(lon0))
        <= d_km
    )


def bbox(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
) -> DataFrame:
    """{!bbox}: bounding-box filter (BBoxField semantics, no wraparound)."""
    return df.filter(
        F.col(lat_col).between(lat_min, lat_max)
        & F.col(lon_col).between(lon_min, lon_max)
    )
