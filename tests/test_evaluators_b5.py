"""Evaluator batch 5: string/vector/matrix families, distributions,
rank tests, fft/loess — checked against numpy mirrors."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_spark.functions import evaluators as ev


def _one(df, col):
    return df.select(col.alias("v")).collect()[0]["v"]


@pytest.fixture(scope="module")
def unit(spark):
    return spark.range(1)


def test_string_family(spark, unit):
    s = F.lit("  Hello World  ")
    assert _one(unit, ev.STRING["upper"](s)) == "  HELLO WORLD  "
    assert _one(unit, ev.STRING["trim"](s)) == "Hello World"
    assert _one(unit, ev.STRING["replace"](s, "World", "There")) == "  Hello There  "
    assert _one(unit, ev.STRING["matches"](F.lit("abc123"), r"[a-c]+\d+"))
    assert _one(unit, ev.STRING["indexOf"](F.lit("abcdef"), F.lit("cd"))) == 2
    assert _one(unit, ev.STRING["indexOf"](F.lit("abcdef"), F.lit("zz"))) == -1
    assert _one(unit, ev.STRING["split"](F.lit("a,b,c"), ",")) == ["a", "b", "c"]


def test_vector_family(spark, unit):
    a = F.array(*[F.lit(float(x)) for x in (3.0, -4.0, 1.0, 0.0)])
    b = F.array(*[F.lit(float(x)) for x in (1.0, 2.0, -1.0, 2.0)])
    assert _one(unit, ev.VECTOR["l1norm"](a)) == 8.0
    assert _one(unit, ev.VECTOR["linfnorm"](a)) == 4.0
    assert _one(unit, ev.VECTOR["sumSq"](a)) == 26.0
    assert _one(unit, ev.VECTOR["chebyshev"](a, b)) == 6.0
    can = _one(unit, ev.VECTOR["canberra"](a, b))
    assert can == pytest.approx(2/4 + 6/6 + 2/2 + 2/2)
    assert _one(unit, ev.VECTOR["scalarAdd"](F.lit(1.0), a)) == [4.0, -3.0, 2.0, 1.0]
    ns = _one(unit, ev.VECTOR["normalizeSum"](F.array(F.lit(1.0), F.lit(3.0))))
    assert ns == [0.25, 0.75]
    assert _one(unit, ev.VECTOR["valueAt"](a, F.lit(1))) == -4.0
    assert _one(unit, ev.VECTOR["append"](a, F.lit(9.0)))[-1] == 9.0
    assert _one(unit, ev.VECTOR["natural"](F.lit(4))) == [0.0, 1.0, 2.0, 3.0]
    assert _one(unit, ev.VECTOR["mode"](
        F.array(*[F.lit(float(x)) for x in (1, 2, 2, 3, 3, 3)])
    )) == 3.0
    # percentile matches numpy's linear interpolation
    vals = [4.0, 1.0, 7.0, 2.0, 9.0]
    arr = F.array(*[F.lit(v) for v in vals])
    for p in (0, 25, 50, 90, 100):
        got = _one(unit, ev.VECTOR["percentile"](arr, p))
        assert got == pytest.approx(float(np.percentile(vals, p)))
    # 1-D EMD: histograms [2,0,1] vs [1,1,1] → |1| + |0| + |0| = 1
    emd = _one(unit, ev.VECTOR["earthMovers"](
        F.array(F.lit(2.0), F.lit(0.0), F.lit(1.0)),
        F.array(F.lit(1.0), F.lit(1.0), F.lit(1.0)),
    ))
    assert emd == 1.0
    z = _one(unit, ev.VECTOR["zscores"](F.array(F.lit(1.0), F.lit(3.0))))
    assert z == pytest.approx([-1.0, 1.0])


def test_matrix_family(spark, unit):
    A = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    B = [[1.0, 0.0, 2.0], [0.0, 1.0, 1.0]]
    mA = F.array(*[F.array(*[F.lit(v) for v in r]) for r in A])
    mB = F.array(*[F.array(*[F.lit(v) for v in r]) for r in B])
    assert _one(unit, ev.MATRIX["rowCount"](mA)) == 3
    assert _one(unit, ev.MATRIX["columnCount"](mA)) == 2
    assert _one(unit, ev.MATRIX["transpose"](mA)) == [
        [1.0, 3.0, 5.0], [2.0, 4.0, 6.0]
    ]
    assert _one(unit, ev.MATRIX["sumRows"](mA)) == [3.0, 7.0, 11.0]
    assert _one(unit, ev.MATRIX["sumColumns"](mA)) == [9.0, 12.0]
    assert _one(unit, ev.MATRIX["grandSum"](mA)) == 21.0
    got = _one(unit, ev.MATRIX["matrixMult"](mA, mB))
    assert got == (np.array(A) @ np.array(B)).tolist()
    assert _one(unit, ev.MATRIX["colAt"](mA, F.lit(1))) == [2.0, 4.0, 6.0]


def test_distribution_closed_forms(spark, unit):
    # binomial pmf vs direct computation
    got = _one(unit, ev.binomial_pmf(F.lit(3), F.lit(10), F.lit(0.4)))
    assert got == pytest.approx(math.comb(10, 3) * 0.4**3 * 0.6**7)
    assert _one(unit, ev.geometric_pmf(F.lit(2), F.lit(0.25))) == pytest.approx(
        0.75**2 * 0.25
    )
    assert _one(unit, ev.uniform_int_pmf(F.lit(5), F.lit(1), F.lit(10))) == 0.1
    assert _one(unit, ev.uniform_int_pmf(F.lit(11), F.lit(1), F.lit(10))) == 0.0
    # lognormal/weibull/triangular pdf-cdf sanity vs numpy formulas
    x, mu, sg = 2.0, 0.5, 0.8
    lp = _one(unit, ev.lognormal_pdf(F.lit(x), F.lit(mu), F.lit(sg)))
    want = math.exp(-0.5 * ((math.log(x) - mu) / sg) ** 2) / (
        x * sg * math.sqrt(2 * math.pi)
    )
    assert lp == pytest.approx(want, rel=1e-9)
    wc = _one(unit, ev.weibull_cdf(F.lit(2.0), F.lit(1.5), F.lit(1.0)))
    assert wc == pytest.approx(1 - math.exp(-(2.0**1.5)))
    tp = _one(unit, ev.triangular_pdf(F.lit(0.5), F.lit(0.0), F.lit(0.5), F.lit(1.0)))
    assert tp == pytest.approx(2.0)
    zp = _one(unit, ev.zipf_pmf(F.lit(2), F.lit(1.0), 4))
    h = 1 + 0.5 + 1 / 3 + 0.25
    assert zp == pytest.approx(0.5 / h)


def test_welch_ttest_and_mannwhitney(spark):
    rng = np.random.default_rng(5)
    a = rng.normal(10.0, 2.0, 400).round(2)
    b = rng.normal(10.6, 2.0, 500).round(2)
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ev.welch_ttest(df, "v", "g", "a", "b").collect()[0]
    # numpy mirror of the Welch statistic
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    dof = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert r["t_stat"] == pytest.approx(t, rel=1e-9)
    assert r["df"] == pytest.approx(dof, rel=1e-9)
    assert 0.0 <= r["p_value"] <= 1.0 and r["p_value"] < 0.01  # real shift
    # Mann-Whitney: U + midranks mirrored in numpy
    m = ev.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    pooled = np.concatenate([a, b])
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(len(pooled))
    sorted_v = pooled[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    ra = ranks[: len(a)].sum()
    u = ra - len(a) * (len(a) + 1) / 2
    assert m["u_stat"] == pytest.approx(u, rel=1e-12)
    assert 0.0 <= m["p_value"] <= 1.0


def test_fft_and_loess(spark):
    xs = [float(i) for i in range(32)]
    ys = [math.sin(2 * math.pi * 4 * i / 32) for i in range(32)]
    df = spark.createDataFrame([(xs, ys)], "x array<double>, y array<double>")
    r = ev.fft_cols(df, "y").collect()[0]["fft"]
    want = np.fft.fft(np.array(ys))
    assert np.allclose(r[0], want.real) and np.allclose(r[1], want.imag)
    # dominant bin is k=4 (and its mirror)
    mags = np.hypot(np.array(r[0]), np.array(r[1]))
    assert set(np.argsort(mags)[-2:]) == {4, 28}
    # loess smooths additive noise toward the trend
    rng = np.random.default_rng(3)
    trend = np.linspace(0, 10, 60)
    noisy = trend + rng.normal(0, 0.5, 60)
    df2 = spark.createDataFrame(
        [(np.linspace(0, 1, 60).tolist(), noisy.tolist())],
        "x array<double>, y array<double>",
    )
    sm = np.array(ev.loess_smooth(df2, "x", "y", 0.3).collect()[0]["smoothed"])
    assert np.abs(sm - trend).mean() < np.abs(noisy - trend).mean()


def test_derivative_integral(spark, unit):
    xs = [0.0, 1.0, 2.0, 3.0]
    ys = [0.0, 1.0, 4.0, 9.0]  # y = x^2 sampled
    ax = F.array(*[F.lit(v) for v in xs])
    ay = F.array(*[F.lit(v) for v in ys])
    d = _one(unit, ev.VECTOR["derivative"](ax, ay))
    # central differences: interior ≈ 2x, ends one-sided
    assert d == [1.0, 2.0, 4.0, 5.0]
    integ = _one(unit, ev.VECTOR["integral"](ax, ay))
    assert integ == pytest.approx(np.trapz(ys, xs))


def test_fuzzy_kmeans_memberships(spark):
    from solr_spark.functions.similarity import fuzzy_kmeans

    rng = np.random.default_rng(9)
    c0 = rng.normal(0, 0.1, (20, 8)) + np.array([5.0] + [0.0] * 7)
    c1 = rng.normal(0, 0.1, (20, 8)) + np.array([-5.0] + [0.0] * 7)
    rows = [(i, v.tolist()) for i, v in enumerate(np.vstack([c0, c1]))]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    m = fuzzy_kmeans(emb, 2, iters=3, fuzziness=2.0).collect()
    # memberships sum to 1 per point
    by_id = {}
    for r in m:
        by_id.setdefault(r["vec_id"], {})[r["cluster_id"]] = r["membership"]
    for vid, mm in by_id.items():
        assert sum(mm.values()) == pytest.approx(1.0, abs=1e-9)
        # well-separated planted clusters → dominant membership > 0.99
        assert max(mm.values()) > 0.99
    # points from the same planted cluster share their argmax cluster
    arg0 = {max(by_id[i], key=by_id[i].get) for i in range(20)}
    arg1 = {max(by_id[i], key=by_id[i].get) for i in range(20, 40)}
    assert len(arg0) == 1 and len(arg1) == 1 and arg0 != arg1


def test_poisson_pmf_large_k(spark, unit):
    """k > 20 must not NULL out (Spark factorial() does): the log-space
    form matches scipy/Commons Math pmf(25; λ=20) ≈ 0.0446."""
    v = _one(unit, ev.poisson_pmf(F.lit(25), F.lit(20.0)))
    assert v == pytest.approx(0.0446, abs=5e-4)
    # small-k agreement with the direct factorial form
    v2 = _one(unit, ev.poisson_pmf(F.lit(3), F.lit(2.0)))
    assert v2 == pytest.approx(math.exp(-2.0) * 2.0**3 / 6.0, rel=1e-12)


def test_precision_column_sigfigs(spark, unit):
    """PrecisionEvaluator: the significant-figures arg is a value source
    too — a per-row Column must be honored, not coerced to 0."""
    assert _one(
        unit, ev.SCALAR["precision"](F.lit(123.456), F.lit(4))
    ) == pytest.approx(123.5)
    assert _one(
        unit, ev.SCALAR["precision"](F.lit(123.456), 2)
    ) == pytest.approx(120.0)


def test_binomial_pmf_large_n(spark, unit):
    """n > 20 must not NULL out (factorial ceiling): pmf(9; n=30, p=0.3)
    ≈ 0.1573, and the p∈{0,1} degenerate cases stay exact."""
    v = _one(unit, ev.binomial_pmf(F.lit(9), F.lit(30), F.lit(0.3)))
    assert v == pytest.approx(0.15729, abs=1e-5)
    assert _one(unit, ev.binomial_pmf(F.lit(0), F.lit(30), F.lit(0.0))) == 1.0
    assert _one(unit, ev.binomial_pmf(F.lit(30), F.lit(30), F.lit(1.0))) == 1.0
    assert _one(unit, ev.binomial_pmf(F.lit(3), F.lit(30), F.lit(1.0))) == 0.0
