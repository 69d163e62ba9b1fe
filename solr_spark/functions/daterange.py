"""DateRangeField — RANGES AS VALUES (SURVEY §1.2).

The reference's DateRangeField (solr/core/src/java/org/apache/solr/
schema/DateRangeField.java) stores date RANGES as field values and
answers range-vs-range queries under the three Lucene spatial
operations (DateRangeField.java:145 — Intersects default, plus the
``op`` local param selecting Contains/Within), with truncated-date
syntax expanding to implicit ranges ("2020-06" = the whole month) and
``[A TO B]`` bracket syntax for explicit ranges.

Spark-first translation: a range value is a plain
``struct<start:timestamp, end:timestamp>`` column (inclusive
endpoints), each operation is a pure Catalyst boolean expression over
the struct fields (Allen-interval algebra — no UDF, fully
pushdown/codegen friendly), and the query-side parser expands the
reference's truncated-date grammar driver-side into two literal
timestamps.  At 100 TB the predicates are min/max-prunable scans: a
parquet row group whose (start,end) column stats cannot intersect the
query window is skipped entirely.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "date_range",
    "parse_daterange",
    "dr_intersects",
    "dr_contains",
    "dr_within",
]

_MS = timedelta(milliseconds=1)

# truncated ISO instant: each omitted unit widens the implicit range
# (DateRangeField's DateRangePrefixTree calendar semantics)
_TRUNC_RE = re.compile(
    r"^(\d{4})(?:-(\d{2})(?:-(\d{2})(?:T(\d{2})(?::(\d{2})(?::(\d{2})"
    r"(?:\.(\d{1,3}))?)?)?Z?)?)?)?$"
)


def date_range(start: Column | str, end: Column | str,
               name: str = "range") -> Column:
    """Build a range value struct<start,end> from two timestamp
    columns (inclusive endpoints)."""
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return F.struct(s.alias("start"), e.alias("end")).alias(name)


def _trunc_bounds(val: str) -> tuple[datetime, datetime]:
    m = _TRUNC_RE.match(val)
    if not m:
        raise ValueError(f"unparseable DateRangeField value: {val!r}")
    y, mo, d, h, mi, s, ms = m.groups()
    year = int(y)
    if mo is None:
        return (datetime(year, 1, 1),
                datetime(year, 12, 31, 23, 59, 59, 999000))
    month = int(mo)
    if d is None:
        last = calendar.monthrange(year, month)[1]
        return (datetime(year, month, 1),
                datetime(year, month, last, 23, 59, 59, 999000))
    day = int(d)
    if h is None:
        return (datetime(year, month, day),
                datetime(year, month, day, 23, 59, 59, 999000))
    hour = int(h)
    if mi is None:
        base = datetime(year, month, day, hour)
        return base, base + timedelta(hours=1) - _MS
    minute = int(mi)
    if s is None:
        base = datetime(year, month, day, hour, minute)
        return base, base + timedelta(minutes=1) - _MS
    sec = int(s)
    if ms is None:
        base = datetime(year, month, day, hour, minute, sec)
        return base, base + timedelta(seconds=1) - _MS
    micro = int(ms.ljust(3, "0")) * 1000
    point = datetime(year, month, day, hour, minute, sec, micro)
    return point, point


def parse_daterange(val: str) -> tuple[datetime, datetime]:
    """Parse the reference's DateRangeField value syntax into inclusive
    (start, end) datetimes: ``[A TO B]`` with each side a (possibly
    truncated) ISO instant or ``*``, or a bare truncated instant whose
    omitted units widen the range ("2020-06" = that whole month).
    Reference grammar: DateRangeField.parseShape / DateRangePrefixTree."""
    v = val.strip()
    if v.startswith("[") and v.endswith("]"):
        lo, _, hi = v[1:-1].partition(" TO ")
        if not hi:
            raise ValueError(f"range needs ' TO ': {val!r}")
        lo, hi = lo.strip(), hi.strip()
        start = (datetime(1, 1, 1) if lo == "*" else _trunc_bounds(lo)[0])
        end = (datetime(9999, 12, 31, 23, 59, 59, 999000)
               if hi == "*" else _trunc_bounds(hi)[1])
        return start, end
    return _trunc_bounds(v)


def _q(qs: datetime | str, qe: datetime | str | None):
    """Accept either two datetimes or one DateRangeField string."""
    if isinstance(qs, str) and qe is None:
        qs, qe = parse_daterange(qs)
    return F.lit(qs), F.lit(qe)


def dr_intersects(r: Column, qs, qe=None) -> Column:
    """Doc range intersects the query range (the default op,
    DateRangeField.java:145): r.start <= q.end AND r.end >= q.start."""
    s, e = _q(qs, qe)
    return (r["start"] <= e) & (r["end"] >= s)


def dr_contains(r: Column, qs, qe=None) -> Column:
    """Doc range CONTAINS the query range (op=Contains):
    r.start <= q.start AND r.end >= q.end."""
    s, e = _q(qs, qe)
    return (r["start"] <= s) & (r["end"] >= e)


def dr_within(r: Column, qs, qe=None) -> Column:
    """Doc range lies WITHIN the query range (op=Within):
    r.start >= q.start AND r.end <= q.end."""
    s, e = _q(qs, qe)
    return (r["start"] >= s) & (r["end"] <= e)
