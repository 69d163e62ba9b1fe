"""t-digest: rank-error bound, exact singleton path, mergeability,
determinism, and the Spark two-level pipeline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_spark.functions.tdigest import (
    tdigest_build,
    tdigest_merge_arrays,
    tdigest_merged,
    tdigest_partials,
    tdigest_quantile,
    tdigest_quantiles_df,
)


def _rank_error(values, est, q):
    v = np.sort(np.asarray(values, dtype=float))
    rank = np.searchsorted(v, est, side="right")
    return abs(rank / len(v) - q)


def test_rank_error_bound():
    """k0 scale: centroid capacity 2W/delta → worst-case rank error
    ≤ 1/delta·W... documented ε = 2/delta on the rank scale."""
    rng = np.random.default_rng(3)
    values = rng.lognormal(0.0, 1.0, size=20_000)
    m, w = tdigest_build(values, delta=100)
    assert len(m) <= 110  # O(delta) centroids
    for q in (0.01, 0.1, 0.5, 0.9, 0.95, 0.99):
        est = tdigest_quantile(m, w, q)
        assert _rank_error(values, est, q) <= 0.02, q


def test_exact_singleton_path():
    """delta >= 2W → every centroid is one value → quantiles ARE numpy
    'linear' percentiles (the exact-equality rank path)."""
    rng = np.random.default_rng(4)
    values = rng.normal(size=101)
    m, w = tdigest_build(values, delta=2 * len(values) + 1)
    assert len(m) == len(values) and set(w.tolist()) == {1}
    for q in (0.0, 0.25, 0.5, 0.75, 0.9, 1.0):
        assert tdigest_quantile(m, w, q) == pytest.approx(
            float(np.percentile(values, q * 100)), abs=1e-12
        )


def test_merge_matches_build_accuracy():
    """merge(build(A), build(B)) stays within the documented ε of the
    exact quantiles of A ∪ B (the PercentileAgg shard contract)."""
    rng = np.random.default_rng(5)
    a = rng.gamma(2.0, 2.0, size=8_000)
    b = rng.gamma(5.0, 1.0, size=12_000)
    merged = tdigest_merge_arrays(
        [tdigest_build(a, 100), tdigest_build(b, 100)], 100
    )
    allv = np.concatenate([a, b])
    for q in (0.1, 0.5, 0.9, 0.99):
        est = tdigest_quantile(*merged, q)
        assert _rank_error(allv, est, q) <= 0.03, q


def test_build_order_invariant():
    rng = np.random.default_rng(6)
    values = rng.normal(size=5_000)
    m1, w1 = tdigest_build(values, 50)
    m2, w2 = tdigest_build(values[::-1].copy(), 50)
    assert (m1 == m2).all() and (w1 == w2).all()


def test_spark_two_level_pipeline_matches_local(spark):
    """tdigest_partials → tdigest_merged over deterministic shards must
    equal the local shard-order merge bit for bit (the property the
    DuckDB oracle of a_percentile_digest relies on)."""
    rng = np.random.default_rng(7)
    rows = [(int(i), float(v)) for i, v in enumerate(rng.normal(size=2_000))]
    df = spark.createDataFrame(rows, "id bigint, v double")
    parts = tdigest_partials(df, [], "v", F.col("id") % 4, delta=64)
    merged = tdigest_merged(parts, [], delta=64).collect()
    assert len(merged) == 1
    got_m = np.asarray(merged[0]["means"])
    got_w = np.asarray(merged[0]["weights"])

    shards = {}
    for i, v in rows:
        shards.setdefault(i % 4, []).append(v)
    local = tdigest_merge_arrays(
        [tdigest_build(shards[s], 64) for s in sorted(shards)], 64
    )
    assert (got_m == local[0]).all() and (got_w == local[1]).all()

    qdf = tdigest_quantiles_df(
        tdigest_merged(parts, [], delta=64), [], [0.5]
    ).collect()[0]
    assert qdf["p50"] == pytest.approx(
        round(tdigest_quantile(*local, 0.5), 6), abs=1e-12
    )


def test_spark_grouped_digest(spark):
    rows = [(("a" if i % 2 else "b"), int(i), float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id bigint, v double")
    parts = tdigest_partials(df, ["g"], "v", F.col("id") % 3, delta=400)
    out = {
        r["g"]: r
        for r in tdigest_quantiles_df(
            tdigest_merged(parts, ["g"], delta=400), ["g"], [0.5]
        ).collect()
    }
    # delta=400 >= 2W per group (100 values) → exact medians
    assert out["b"]["p50"] == pytest.approx(np.percentile(np.arange(0, 200, 2), 50))
    assert out["a"]["p50"] == pytest.approx(np.percentile(np.arange(1, 200, 2), 50))
