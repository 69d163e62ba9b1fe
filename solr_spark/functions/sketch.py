"""Cardinality sketches: a from-scratch HyperLogLog over Catalyst columns.

Reference parity: Solr's ``hll`` aggregation
(solr/core/src/java/org/apache/solr/search/facet/HLLAgg.java:1) wraps
java-hll's HyperLogLog (Flajolet/Fusy/Gandouet/Meunier 2007).  This module
re-derives the sketch from the paper as pure DataFrame algebra:

* register stream — hash each value with md5 (deterministic, available in
  every SQL engine), take the top ``p`` bits as the bucket index and the
  position of the first set bit of the next 52 bits as ``rho``;
* sketch — ``groupBy(bucket).max(rho)``: at most ``m = 2**p`` rows per
  group ever shuffle, regardless of input size (Spark's partial
  aggregation collapses each map partition to its local register set
  before the exchange), and two sketches merge with the same ``max`` —
  the mergeable-sketch property that makes this viable over 100 TB;
* estimate — the paper's bias-corrected harmonic mean with the
  small-range linear-counting correction.

Determinism contract: the harmonic-mean denominator ``sum(2**-rho)`` is
accumulated as the exact integer ``sum(2**(53-rho))`` (every term is a
dyadic rational, so the scaled sum is exact in DECIMAL/HUGEINT and immune
to float summation order).  The final estimate is a fixed-size double
expression over exact integers, bit-identical across engines — the DuckDB
oracle in gate.py mirrors the arithmetic and the driver check is an exact
triple match, not rows-only.

``p`` must be a multiple of 4: the bucket is carved out of the md5 hex
string a nibble at a time, which is what lets plain-SQL engines mirror it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "hll_count_distinct",
]

_W_HEX = 13  # 52 bits of rho material after the bucket prefix
_RHO_MAX = 4 * _W_HEX + 1


def _alpha(m: int) -> float:
    # Flajolet et al. 2007, fig. 3 (m >= 128 branch; p >= 8 enforced below)
    return 0.7213 / (1.0 + 1.079 / m)


def _check_p(p: int) -> None:
    if p % 4 != 0 or not 8 <= p <= 16:
        raise ValueError(f"hll precision must be one of 8/12/16, got {p}")


def _rho(w_name: str) -> Column:
    """Position of the first set bit of the hex-string column ``w_name``.

    Leading zero nibbles count 4 bits each; the first non-zero nibble
    contributes 0-3 more depending on its top set bit.  All-zero w (md5
    collision of the full window, probability 2**-52) saturates at 53 —
    the same saturation a 52-bit register would apply.
    """
    trimmed = F.expr(f"ltrim('0', {w_name})")
    zero_nibbles = F.lit(_W_HEX) - F.length(trimmed)
    first = F.conv(F.substring(trimmed, 1, 1), 16, 10).cast("int")
    lz_bits = (
        F.when(first >= 8, 0).when(first >= 4, 1).when(first >= 2, 2).otherwise(3)
    )
    return F.when(F.length(trimmed) == 0, F.lit(_RHO_MAX)).otherwise(
        zero_nibbles * 4 + lz_bits + 1
    )


def hll_registers(
    df: DataFrame, value_col: str, keys: list[str] | None = None, p: int = 12
) -> DataFrame:
    """The mergeable sketch: one row per (keys..., bucket) with max rho."""
    _check_p(p)
    keys = list(keys or [])
    hex_chars = p // 4
    h = F.md5(F.col(value_col).cast("string"))
    rows = (
        df.where(F.col(value_col).isNotNull())
        .select(
            *keys,
            F.conv(F.substring(h, 1, hex_chars), 16, 10).cast("int").alias("bucket"),
            F.substring(h, hex_chars + 1, _W_HEX).alias("w"),
        )
        .select(*keys, "bucket", _rho("w").alias("rho"))
    )
    return rows.groupBy(*keys, "bucket").agg(F.max("rho").alias("rho"))


def hll_merge(*register_dfs: DataFrame) -> DataFrame:
    """Merge sketches built by :func:`hll_registers` (same keys and p)."""
    if not register_dfs:
        raise ValueError("nothing to merge")
    out = register_dfs[0]
    for other in register_dfs[1:]:
        out = out.unionByName(other)
    keys = [c for c in out.columns if c not in ("bucket", "rho")]
    return out.groupBy(*keys, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame, keys: list[str] | None = None, p: int = 12
) -> DataFrame:
    """Bias-corrected estimate per key group, as BIGINT ``n_hll``."""
    _check_p(p)
    keys = list(keys or [])
    m = 1 << p
    alpha = _alpha(m)
    scaled = F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), 53 - rho) AS DECIMAL(38,0))"
    )
    agg = registers.groupBy(*keys).agg(
        F.sum(scaled).alias("s53"), F.count(F.lit(1)).alias("c")
    )
    s = F.col("s53").cast("double") / F.lit(float(1 << 53))
    zeros = (F.lit(m) - F.col("c")).cast("double")
    raw = F.lit(alpha * m * m) / (s + zeros)
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lin).otherwise(raw)
    return agg.select(*keys, F.round(est, 0).cast("long").alias("n_hll"))


def hll_count_distinct(
    df: DataFrame, value_col: str, keys: list[str] | None = None, p: int = 12
) -> DataFrame:
    """Approximate count-distinct of ``value_col`` per key group
    (HLLAgg analog; the exact counterpart is ``countDistinct``)."""
    return hll_estimate(hll_registers(df, value_col, keys, p), keys, p)
