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


# ---------------------------------------------------------------------------
# WKT polygon filtering (SpatialRecursivePrefixTreeFieldType's
# {!field f=geo}Intersects(POLYGON((...))) surface, core/.../schema/
# AbstractSpatialPrefixTreeFieldType.java). The query polygon is a
# CONSTANT, so point-in-polygon compiles to a fixed per-edge crossing
# expression — pure Catalyst arithmetic (whole-stage codegen), no UDF —
# and the identical expression is emitted as SQL for the oracle.

def parse_wkt_polygon(wkt: str) -> list[tuple[float, float]]:
    """Parse a simple WKT POLYGON (single ring, no holes) into its
    (x, y) vertex list; the closing vertex is dropped. Raises on
    malformed/unclosed rings and on MULTIPOLYGON/holes (documented
    unsupported — fail loudly, never silently mis-filter)."""
    import re as _re

    m = _re.fullmatch(
        r"\s*POLYGON\s*\(\s*\(([^()]*)\)\s*\)\s*", wkt, _re.IGNORECASE
    )
    if not m:
        raise ValueError(
            "only simple 'POLYGON ((x y, x y, ...))' supported "
            "(no holes/MULTIPOLYGON); got: " + wkt[:80]
        )
    pts = []
    for pair in m.group(1).split(","):
        xy = pair.split()
        if len(xy) != 2:
            raise ValueError(f"bad WKT coordinate pair: {pair!r}")
        pts.append((float(xy[0]), float(xy[1])))
    if len(pts) < 4 or pts[0] != pts[-1]:
        raise ValueError("WKT ring must close on its first vertex")
    return pts[:-1]


def _pip_terms(ring: list[tuple[float, float]]):
    """The shared edge list for the ray-casting parity test: point is
    inside iff an odd number of edges satisfy
      (y1 > y) != (y2 > y)  AND  x < (x2-x1)*(y-y1)/(y2-y1) + x1."""
    n = len(ring)
    return [(ring[i], ring[(i + 1) % n]) for i in range(n)]


def point_in_polygon(x: Column, y: Column, ring: list[tuple[float, float]]) -> Column:
    """Boolean Column: ray-casting parity over the constant ring."""
    crossings: Column = F.lit(0)
    for (x1, y1), (x2, y2) in _pip_terms(ring):
        cond = (
            ((F.lit(y1) > y) != (F.lit(y2) > y))
            & (x < (F.lit(x2) - F.lit(x1)) * (y - F.lit(y1))
               / (F.lit(y2) - F.lit(y1)) + F.lit(x1))
        )
        crossings = crossings + F.when(cond, 1).otherwise(0)
    return crossings % 2 == 1


def point_in_polygon_sql(x: str, y: str, ring: list[tuple[float, float]]) -> str:
    """The SAME per-edge expression as SQL text (term-for-term mirror
    of point_in_polygon, same float arithmetic both engines)."""
    terms = []
    for (x1, y1), (x2, y2) in _pip_terms(ring):
        terms.append(
            f"(CASE WHEN (({y1} > {y}) <> ({y2} > {y})) AND "
            f"({x} < ({x2} - {x1}) * ({y} - {y1}) / ({y2} - {y1}) + {x1}) "
            f"THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ") % 2 = 1"


def polygon_filter(
    df: DataFrame, lon_col: str, lat_col: str, wkt: str
) -> DataFrame:
    """Intersects(POLYGON(...)) for point columns: keep rows whose
    (lon, lat) falls inside the WKT ring."""
    ring = parse_wkt_polygon(wkt)
    return df.filter(point_in_polygon(F.col(lon_col), F.col(lat_col), ring))
