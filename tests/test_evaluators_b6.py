"""Evaluator batch 6: catalyst long-tail (diff/rank/finddelay/freqTable/
oscillate/copyOf), mathx (OLS, knn search/regress, corr p-values,
samplers, hist, curve fits, 2-D geometry, labeled matrices)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_spark.functions import evaluators as ev
from solr_spark.functions import mathx as mx


def _one(df, col):
    return df.select(col.alias("v")).collect()[0]["v"]


@pytest.fixture(scope="module")
def unit(spark):
    return spark.range(1)


def test_scalar_aliases(spark, unit):
    assert _one(unit, ev.SCALAR["recip"](F.lit(4.0))) == 0.25
    assert _one(unit, ev.SCALAR["noop"](F.lit(7))) == 7
    assert _one(unit, ev.SCALAR["val"](3.5)) == 3.5
    assert _one(unit, ev.SCALAR["null"]()) is None


def test_vector_aliases_and_diff(spark, unit):
    a = F.array(*[F.lit(v) for v in (1.0, 3.0, 6.0, 10.0)])
    assert _one(unit, ev.VECTOR["avg"](a)) == 5.0
    assert _one(unit, ev.VECTOR["count"](a)) == 4
    assert _one(unit, ev.VECTOR["countDist"](F.array(
        F.lit(1.0), F.lit(1.0), F.lit(2.0)))) == 2
    assert _one(unit, ev.VECTOR["diff"](a)) == [2.0, 3.0, 4.0]
    assert _one(unit, ev.VECTOR["diff"](a, 2)) == [5.0, 7.0]
    b = F.array(*[F.lit(v) for v in (0.0, 1.0, 2.0, 3.0)])
    assert _one(unit, ev.VECTOR["meanDifference"](a, b)) == pytest.approx(3.5)
    assert _one(unit, ev.VECTOR["sumDifference"](a, b)) == pytest.approx(14.0)


def test_rank_natural_ranking(spark, unit):
    # Commons Math NaturalRanking default: ties → average rank
    a = F.array(*[F.lit(v) for v in (20.0, 10.0, 30.0, 10.0)])
    assert _one(unit, ev.VECTOR["rank"](a)) == [3.0, 1.5, 4.0, 1.5]


def test_copy_of(spark, unit):
    a = F.array(F.lit(5.0), F.lit(6.0), F.lit(7.0))
    assert _one(unit, ev.VECTOR["copyOf"](a, 2)) == [5.0, 6.0]
    assert _one(unit, ev.VECTOR["copyOf"](a, 5)) == [5.0, 6.0, 7.0, 0.0, 0.0]


def test_finddelay(spark, unit):
    # b is a shifted by 2 → delay 2 (FindDelayEvaluator contract)
    a = F.array(*[F.lit(v) for v in (0.0, 0.0, 1.0, 2.0, 3.0, 0.0, 0.0)])
    b = F.array(*[F.lit(v) for v in (1.0, 2.0, 3.0, 0.0, 0.0, 0.0, 0.0)])
    assert _one(unit, ev.VECTOR["finddelay"](a, b)) == 2
    assert _one(unit, ev.VECTOR["finddelay"](b, b)) == 0


def test_freq_table(spark, unit):
    a = F.array(*[F.lit(v) for v in (2.0, 1.0, 2.0, 3.0, 2.0)])
    rows = _one(unit, ev.VECTOR["freqTable"](a))
    assert [r["value"] for r in rows] == [1, 2, 3]
    assert [r["count"] for r in rows] == [1, 3, 1]
    assert rows[1]["percent"] == pytest.approx(0.6)
    assert rows[0]["totalFreq"] == 5


def test_oscillate(spark, unit):
    got = _one(unit, ev.VECTOR["oscillate"](F.lit(2.0), F.lit(0.5), F.lit(1.0)))
    want = 2.0 * np.sin(0.5 * np.arange(128) + 1.0)
    assert len(got) == 128
    assert np.allclose(got, want)


def test_parse_csv(spark, unit):
    row = _one(unit, ev.STRING["parseCSV"](F.lit("a,1,2.5"),
                                           "s string, i int, d double"))
    assert (row["s"], row["i"], row["d"]) == ("a", 1, 2.5)
    row = _one(unit, ev.STRING["parseTSV"](F.lit("x\t9"), "s string, i int"))
    assert (row["s"], row["i"]) == ("x", 9)


# ------------------------------------------------------------------ mathx


def test_betainc_and_t_sf():
    # betainc vs known values: I_0.5(2,2) = 0.5; t_sf matches the normal
    # for huge df
    assert mx.betainc(2.0, 2.0, 0.5) == pytest.approx(0.5, abs=1e-10)
    assert mx.betainc(1.0, 1.0, 0.3) == pytest.approx(0.3, abs=1e-10)
    assert mx.t_sf(1.96, 1e7) == pytest.approx(0.05, abs=1e-3)


def test_corr_pvalues():
    # r=0.99 with n=20 → essentially 0; r=0.1 with n=20 → large
    p = mx.corr_pvalues([[1.0, 0.99], [0.99, 1.0]], 20)
    assert p[0][1] < 1e-10 and p[0][0] == 0.0
    p2 = mx.corr_pvalues([[1.0, 0.1], [0.1, 1.0]], 20)
    assert p2[0][1] > 0.5


def test_ols_regress_and_predict(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(200, 2))
    y = 1.5 + 2.0 * X[:, 0] - 3.0 * X[:, 1] + rng.normal(0, 0.01, 200)
    df = spark.createDataFrame(
        [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)],
        "x1 double, x2 double, y double",
    )
    m = mx.ols_regress(df, ["x1", "x2"], "y")
    beta = m["regressionParameters"]
    assert beta[0] == pytest.approx(1.5, abs=0.01)
    assert beta[1] == pytest.approx(2.0, abs=0.01)
    assert beta[2] == pytest.approx(-3.0, abs=0.01)
    assert m["RSquared"] > 0.999
    # numpy mirror via lstsq
    A = np.column_stack([np.ones(200), X])
    ref, *_ = np.linalg.lstsq(A, y, rcond=None)
    assert np.allclose(beta, ref, atol=1e-8)
    pred = mx.ols_predict(df, beta, ["x1", "x2"]).select("prediction", "y")
    rows = pred.collect()
    err = np.array([r["prediction"] - r["y"] for r in rows])
    assert float(np.abs(err).mean()) < 0.02


def test_knn_search_and_regress(spark):
    pts = [(i, [float(i), 0.0], float(i) * 10.0) for i in range(50)]
    corpus = spark.createDataFrame(
        pts, "vec_id bigint, embedding array<double>, y double")
    got = mx.knn_search(corpus, [10.2, 0.0], 3).select("vec_id").collect()
    assert sorted(r["vec_id"] for r in got) == [9, 10, 11]
    qs = spark.createDataFrame(
        [(0, [10.0, 0.0]), (1, [40.0, 0.0])],
        "query_id bigint, embedding array<double>")
    pred = {r["query_id"]: r["prediction"]
            for r in mx.knn_regress(corpus, qs, 3, "y").collect()}
    assert pred[0] == pytest.approx(100.0)  # mean of 90,100,110
    assert pred[1] == pytest.approx(400.0)


def test_samplers_deterministic():
    P = [[0.0, 1.0], [1.0, 0.0]]  # alternating chain
    walk = mx.markov_chain_sample(P, 6, state=0, seed=1)
    assert walk == [1, 0, 1, 0, 1, 0]
    mc = mx.monte_carlo(lambda u: u * u, [lambda rng: rng.uniform(0, 1)],
                        2000, seed=7)
    assert sum(mc) / len(mc) == pytest.approx(1 / 3, abs=0.02)
    s = mx.mvn_sample([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]], 500, seed=5)
    m = np.mean(s, axis=0)
    assert np.abs(m).max() < 0.15
    # density: standard bivariate normal at origin = 1/(2π)
    assert mx.mvn_density([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]],
                          [0.0, 0.0]) == pytest.approx(1 / (2 * math.pi))


def test_hist(spark):
    vals = [float(v) for v in range(100)]
    df = spark.createDataFrame([(vals,)], "a array<double>")
    bins = df.select(mx.hist_col(F.col("a"), 4).alias("h")).collect()[0]["h"]
    assert len(bins) == 4
    assert [b["N"] for b in bins] == [25, 25, 25, 24 + 1]
    assert bins[0]["min"] == 0.0 and bins[-1]["max"] == 99.0
    assert sum(b["prob"] for b in bins) == pytest.approx(1.0)
    assert bins[0]["mean"] == pytest.approx(np.mean(vals[:25]))


def test_harmonic_fit(spark):
    x = np.linspace(0, 20, 200)
    y = 3.0 * np.sin(1.7 * x + 0.4)
    df = spark.createDataFrame([(x.tolist(), y.tolist())],
                               "x array<double>, y array<double>")
    r = mx.harmonic_fit(df, "x", "y").collect()[0]["harmfit"]
    assert r["amplitude"] == pytest.approx(3.0, abs=0.05)
    assert r["angularFrequency"] == pytest.approx(1.7, abs=0.02)
    fitted = np.array(r["fitted"])
    assert float(np.abs(fitted - y).mean()) < 0.05


def test_gauss_fit(spark):
    x = np.linspace(-5, 5, 120)
    y = 4.0 * np.exp(-((x - 0.7) ** 2) / (2 * 1.3**2))
    df = spark.createDataFrame([(x.tolist(), y.tolist())],
                               "x array<double>, y array<double>")
    r = mx.gauss_fit(df, "x", "y").collect()[0]["gaussfit"]
    assert r["a"] == pytest.approx(4.0, abs=0.01)
    assert r["b"] == pytest.approx(0.7, abs=0.01)
    assert r["c"] == pytest.approx(1.3, abs=0.01)


def test_convex_hull_family(spark):
    # unit square + interior points
    pts = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0],
           [0.5, 0.5], [0.2, 0.8]]
    df = spark.createDataFrame([(pts,)], "p array<array<double>>")
    h = df.select(mx.convex_hull(F.col("p")).alias("h")).collect()[0]["h"]
    assert h["area"] == pytest.approx(1.0)
    assert h["boundarySize"] == pytest.approx(4.0)
    assert len(h["vertices"]) == 4
    assert h["baryCenter"] == pytest.approx([0.5, 0.5])
    # projectToBorder: the projection of an interior point onto the hull
    df2 = df.select(mx.convex_hull(F.col("p")).alias("h"))
    proj = df2.select(
        mx.project_to_border(
            mx.get_vertices(F.col("h")),
            F.array(F.lit(0.5), F.lit(0.1)),
        ).alias("q")
    ).collect()[0]["q"]
    assert proj == pytest.approx([0.5, 0.0])


def test_enclosing_disk(spark):
    pts = [[0.0, 0.0], [2.0, 0.0], [1.0, 0.5]]
    df = spark.createDataFrame([(pts,)], "p array<array<double>>")
    d = df.select(mx.enclosing_disk(F.col("p")).alias("d")).collect()[0]["d"]
    assert d["center"] == pytest.approx([1.0, 0.0], abs=1e-9)
    assert d["radius"] == pytest.approx(1.0, abs=1e-9)
    assert len(d["supportPoints"]) == 2


def test_latlon_vectors(spark, unit):
    got = _one(unit, mx.latlon_vectors(
        F.array(F.lit(1.0), F.lit(2.0)), F.array(F.lit(10.0), F.lit(20.0))))
    assert got == [[1.0, 10.0], [2.0, 20.0]]


def test_labeled_matrix_top_features(spark, unit):
    data = F.array(
        F.array(F.lit(0.1), F.lit(0.9), F.lit(0.0)),
        F.array(F.lit(0.5), F.lit(0.0), F.lit(0.7)),
    )
    labels = F.array(F.lit("a"), F.lit("b"), F.lit("c"))
    m = mx.with_labels(data, col_labels=labels)
    assert _one(unit, mx.get_col_labels(m)) == ["a", "b", "c"]
    top = _one(unit, mx.top_features(m, 2))
    assert top == [["b", "a"], ["c", "a"]]


def test_pivot_matrix(spark):
    df = spark.createDataFrame(
        [("r1", "c1", 1.0), ("r1", "c2", 2.0), ("r2", "c2", 5.0)],
        "x string, y string, v double")
    rows = mx.pivot_matrix(df, "x", "y", "v").collect()
    assert [r["x"] for r in rows] == ["r1", "r2"]
    assert rows[0]["c1"] == 1.0 and rows[0]["c2"] == 2.0
    assert rows[1]["c1"] == 0.0 and rows[1]["c2"] == 5.0


def test_membership_matrix(spark):
    from solr_spark.functions.similarity import fuzzy_kmeans

    rng = np.random.default_rng(11)
    c0 = rng.normal(0, 0.05, (10, 4)) + np.array([3.0, 0, 0, 0])
    c1 = rng.normal(0, 0.05, (10, 4)) - np.array([3.0, 0, 0, 0])
    rows = [(i, v.tolist()) for i, v in enumerate(np.vstack([c0, c1]))]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    mm = mx.membership_matrix(fuzzy_kmeans(emb, 2, iters=2)).collect()
    assert len(mm) == 20
    for r in mm:
        assert sum(r["memberships"]) == pytest.approx(1.0, abs=1e-9)
        assert len(r["memberships"]) == 2


def test_score_nodes(spark):
    from solr_spark.operators.graph import score_nodes

    nodes = spark.createDataFrame(
        [("spark", 5), ("rare", 2)], "node string, cnt bigint")
    stats = spark.createDataFrame(
        [("spark", 100), ("rare", 2)], "term string, df bigint")
    got = {r["node"]: r["nodeScore"]
           for r in score_nodes(nodes, stats, 1000).collect()}
    assert got["spark"] == pytest.approx(
        5 * (math.log(1001 / 101) + 1.0))
    assert got["rare"] == pytest.approx(2 * (math.log(1001 / 3) + 1.0))


def test_convert_units(spark, unit):
    assert _one(unit, ev.SCALAR["convert"]("miles", "kilometers",
                                           F.lit(10.0))) == pytest.approx(16.1)
    assert _one(unit, ev.SCALAR["convert"]("KILOMETERS", "FEET",
                                           F.lit(2.0))) == pytest.approx(6561.6)
    with pytest.raises(ValueError):
        ev.SCALAR["convert"]("miles", "meters", F.lit(1.0))


def test_struct_field_ops(spark, unit):
    t = F.struct(F.lit(1).alias("a"), F.lit("x").alias("b"))
    assert _one(unit, ev.SCALAR["getValue"](t, "b")) == "x"
    got = _one(unit, ev.SCALAR["setValue"](t, "b", F.lit("y")))
    assert got["b"] == "y" and got["a"] == 1
    got2 = _one(unit, ev.SCALAR["withField"](t, "c", F.lit(9)))
    assert got2["c"] == 9


def test_recnum_and_cell(spark):
    df = spark.createDataFrame([("c", 1), ("a", 2), ("b", 3)], "k string, v int")
    rows = ev.recnum(df, "k").orderBy("recNum").collect()
    assert [(r["k"], r["recNum"]) for r in rows] == [
        ("a", 0), ("b", 1), ("c", 2)]
    c = ev.cell(df, "tuples").collect()[0]["tuples"]
    assert len(c) == 3 and {t["k"] for t in c} == {"a", "b", "c"}


def test_recnum_over_threshold_runs_distributed(spark, monkeypatch):
    # above RECNUM_WINDOW_MAX the guard switches to global_rank's
    # range-shuffle: same 0-based values, but no single-partition Window
    monkeypatch.setattr(ev, "RECNUM_WINDOW_MAX", 10)
    df = spark.range(50).selectExpr("id k")
    out = ev.recnum(df, "k")
    assert "Window" not in out._jdf.queryExecution().executedPlan().toString()
    rows = out.orderBy("recNum").collect()
    assert [r["recNum"] for r in rows] == list(range(50))
    assert [r["k"] for r in rows] == list(range(50))
