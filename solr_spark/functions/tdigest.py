"""Mergeable t-digest percentile sketch, from scratch.

Reference parity: Solr's ``percentile`` aggregation ships a mergeable
AVLTreeDigest (solr/core/src/java/org/apache/solr/search/facet/
PercentileAgg.java:19,42 — t-digest, Dunning & Ertl, "Computing
extremely accurate quantiles using t-digests", 2019). This module
re-derives the MERGING t-digest variant from the paper with the k0
(uniform) scale function:

    k0(q) = (delta / 2) * q

chosen deliberately: with integer weights the merge/emit decision
``k0(q_new) - k0(q_lo) <= 1``  ⇔  ``(cur_w + w) * delta <= 2 * W``
is pure INTEGER arithmetic — no transcendentals — so the digest built
here and the digest built by the DuckDB oracle are bit-identical
(the same determinism stance as sketch.py's dyadic-rational HLL).
Centroid means are floats, but every mean update is the same
fixed-order expression ``(cur_m*cur_w + x*w) / (cur_w + w)`` in both
engines.

Mergeability (the shard contract PercentileAgg satisfies): partial
digests are built per deterministic shard, then merged by concatenating
centroids in shard order, stable-sorting by mean, and re-compressing
with the same fold. ``merge(build(A), build(B))`` approximates
``build(A ∪ B)`` with the same rank-error bound; saving partial digests
as (means, weights) array columns and merging later is exactly the
save-partial-digests workflow the reference's shards use.

Accuracy: k0 gives uniform centroid capacity 2W/delta, i.e. worst-case
rank error ≤ W/delta (documented ε; tests pin it). With
delta >= 2*W every centroid is a single value and the quantile path
degenerates to EXACT order statistics (numpy 'linear' interpolation) —
the exact-equality rank path, also pinned in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tdigest_build",
    "tdigest_merge_arrays",
    "tdigest_quantile",
    "tdigest_partials",
    "tdigest_merged",
    "tdigest_quantiles_df",
]


def _compress(means: np.ndarray, weights: np.ndarray, delta: int):
    """The shared fold: inputs already ordered (stable by mean);
    emit/merge with the integer k0 criterion. Returns (means, weights)."""
    W = int(weights.sum())
    out_m: list[float] = []
    out_w: list[int] = []
    cur_m = float(means[0])
    cur_w = int(weights[0])
    for i in range(1, len(means)):
        x, w = float(means[i]), int(weights[i])
        if (cur_w + w) * delta <= 2 * W:
            cur_m = (cur_m * cur_w + x * w) / (cur_w + w)
            cur_w = cur_w + w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cur_m, cur_w = x, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m, dtype=np.float64), np.asarray(out_w, dtype=np.int64)


def tdigest_build(values, delta: int = 100):
    """Digest of raw values (unit weights): ascending sort, then the
    fold. Deterministic for any input order of the same multiset."""
    v = np.sort(np.asarray(values, dtype=np.float64), kind="stable")
    if v.size == 0:
        return np.array([], dtype=np.float64), np.array([], dtype=np.int64)
    return _compress(v, np.ones(v.size, dtype=np.int64), delta)


def tdigest_merge_arrays(partials, delta: int = 100):
    """Merge partial digests: concatenate centroids IN PARTIAL ORDER,
    stable-sort by mean (ties keep concat order — the determinism
    contract), re-compress. ``partials`` is a sequence of
    (means, weights) pairs."""
    ms = np.concatenate([np.asarray(m, dtype=np.float64) for m, _ in partials])
    ws = np.concatenate([np.asarray(w, dtype=np.int64) for _, w in partials])
    if ms.size == 0:
        return ms, ws
    order = np.argsort(ms, kind="stable")
    return _compress(ms[order], ws[order], delta)


def tdigest_quantile(means, weights, q: float) -> float:
    """Midpoint-interpolated quantile: centroid i sits at rank
    c_i = qx_i + (w_i - 1)/2 over ranks 0..W-1; target q*(W-1);
    linear interpolation between adjacent centroid means, clamped at
    the ends. With singleton centroids this IS numpy's 'linear'
    percentile."""
    means = np.asarray(means, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.int64)
    if means.size == 0:
        return float("nan")
    W = int(weights.sum())
    qx = np.concatenate([[0], np.cumsum(weights)[:-1]]).astype(np.float64)
    c = qx + (weights - 1) / 2.0
    t = q * (W - 1)
    if t <= c[0]:
        return float(means[0])
    if t >= c[-1]:
        return float(means[-1])
    i = int(np.searchsorted(c, t, side="right")) - 1
    span = c[i + 1] - c[i]
    frac = (t - c[i]) / span
    return float(means[i] + (means[i + 1] - means[i]) * frac)


# ---------------------------------------------------------------------------
# Spark surface: per-shard partials -> per-group merge -> quantiles.


def tdigest_partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    shard_col,
    delta: int = 100,
) -> DataFrame:
    """Stage 1 (the map side): one digest per (group, shard).
    ``shard_col`` is a deterministic expression (e.g. ``key % 8``) so
    every shard's value multiset — and therefore its digest — is
    reproducible at any parallelism. Output: group cols + (shard,
    means array<double>, weights array<bigint>). Each shard's rows
    shuffle once; the digest is O(delta) regardless of shard size."""
    src = df.select(
        *group_cols,
        F.col(value_col).cast("double").alias("__v"),
        shard_col.cast("bigint").alias("shard"),
    )
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in src.select(*group_cols).schema.fields
    )
    schema = (
        (out_fields + ", " if out_fields else "")
        + "shard bigint, means array<double>, weights array<bigint>"
    )

    def kern(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = tdigest_build(pdf["__v"].to_numpy(), delta)
        row = {c: [k] for c, k in zip(group_cols + ["shard"], keys)}
        row["means"] = [list(m)]
        row["weights"] = [[int(x) for x in w]]
        return pd.DataFrame(row)

    return src.groupBy(*group_cols, "shard").applyInPandas(kern, schema)


def tdigest_merged(
    partials: DataFrame,
    group_cols: list[str],
    delta: int = 100,
) -> DataFrame:
    """Stage 2 (the reduce side): merge each group's shard digests in
    shard order. The merge input is O(shards × delta) rows per group —
    independent of data size, the property that lets 1000 executors
    each digest their slice and ship only centroids."""
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in partials.select(*group_cols).schema.fields
    )
    schema = (
        (out_fields + ", " if out_fields else "")
        + "means array<double>, weights array<bigint>"
    )

    def kern(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("shard", kind="stable")
        pairs = [
            (np.asarray(m, dtype=np.float64), np.asarray(w, dtype=np.int64))
            for m, w in zip(pdf["means"], pdf["weights"])
        ]
        m, w = tdigest_merge_arrays(pairs, delta)
        row = {c: [k] for c, k in zip(group_cols, keys)}
        row["means"] = [list(m)]
        row["weights"] = [[int(x) for x in w]]
        return pd.DataFrame(row)

    return partials.groupBy(*group_cols).applyInPandas(kern, schema)


def tdigest_quantiles_df(
    digests: DataFrame,
    group_cols: list[str],
    qs: list[float],
    round_to: int = 6,
) -> DataFrame:
    """Quantile estimates from merged digests, one column per q."""

    def kern(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = {c: pdf[c] for c in group_cols}
            out["n_centroids"] = pdf["means"].map(len)
            for q in qs:
                out[f"p{int(q * 100):02d}"] = [
                    round(tdigest_quantile(m, w, q), round_to)
                    for m, w in zip(pdf["means"], pdf["weights"])
                ]
            yield pd.DataFrame(out)

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in digests.select(*group_cols).schema.fields
    )
    qcols = ", ".join(f"p{int(q * 100):02d} double" for q in qs)
    schema = (
        (out_fields + ", " if out_fields else "")
        + "n_centroids int, " + qcols
    )
    return digests.mapInPandas(kern, schema)
