"""Round-3 batch 8: natural cubic spline, bicubic grid interpolation,
featureSelect, and the let()-scope composition layer (memset / object
cache / tuple / col)."""

import numpy as np
import pytest

from solr_spark.functions import mathx
from solr_spark.lets import LetContext, run_let


# --- spline (SplineEvaluator → natural cubic) ------------------------------


def test_spline_reproduces_knots_and_linear():
    x = [0.0, 1.0, 2.0, 3.0, 4.0]
    y = [0.0, 1.0, 0.0, 1.0, 0.0]
    at_knots = mathx.spline_predict_values(x, y, x)
    assert np.allclose(at_knots, y, atol=1e-12)
    # a natural cubic spline through collinear points IS the line
    lin = mathx.spline_predict_values([0, 1, 2, 3], [1, 3, 5, 7], [0.5, 1.5, 2.9])
    assert np.allclose(lin, [2.0, 4.0, 6.8], atol=1e-12)


def test_spline_natural_boundary():
    # natural spline: S''(x0) = S''(xn) = 0 — check via the c coeffs
    x = np.array([0.0, 1.0, 2.0, 3.0])
    y = np.array([0.0, 2.0, 1.0, 3.0])
    b, c, d = mathx.spline_coeffs(x, y)
    assert abs(c[0]) < 1e-12  # S'' at left end = 2*c0
    # right end: S''(xn) = 2*c_{n-1} + 6*d_{n-1}*h
    h = x[-1] - x[-2]
    assert abs(2 * c[-1] + 6 * d[-1] * h) < 1e-12


def test_spline_column(spark):
    df = spark.createDataFrame(
        [([0.0, 1.0, 2.0, 3.0], [0.0, 1.0, 4.0, 9.0], [1.5, 2.5])],
        "x array<double>, y array<double>, at array<double>",
    )
    out = df.select(
        mathx.spline_predict("x", "y", "at").alias("p")
    ).collect()[0].p
    # x^2 samples: cubic spline is exact on the knots, close between
    assert out == pytest.approx([2.25, 6.25], abs=0.2)


# --- bicubic (BicubicSplineEvaluator) --------------------------------------


def test_bicubic_exact_on_bilinear_and_knots():
    xs = [0.0, 1.0, 2.0, 3.0]
    ys = [0.0, 1.0, 2.0]
    grid = [[2 * x + 3 * y for y in ys] for x in xs]
    got = mathx.bicubic_predict_values(xs, ys, grid, [[0.5, 0.5], [2.9, 1.9]])
    assert got == pytest.approx([2.5, 11.5], abs=1e-9)
    # grid nodes reproduce exactly
    got2 = mathx.bicubic_predict_values(xs, ys, grid, [[1.0, 2.0], [3.0, 0.0]])
    assert got2 == pytest.approx([8.0, 6.0], abs=1e-9)


def test_bicubic_smooth_surface():
    xs = list(np.linspace(0, 3, 7))
    ys = list(np.linspace(0, 3, 7))
    grid = [[np.sin(x) * np.cos(y) for y in ys] for x in xs]
    pts = [[0.7, 1.3], [2.2, 0.4], [1.1, 2.8]]
    got = mathx.bicubic_predict_values(xs, ys, grid, pts)
    want = [np.sin(x) * np.cos(y) for x, y in pts]
    # one-sided boundary differences cap accuracy near the grid edge
    assert got == pytest.approx(want, abs=2e-2)


# --- featureSelect ---------------------------------------------------------


def test_feature_select(spark):
    from solr_spark.functions.classify import term_vectors

    rows = [
        ("d1", t) for t in ["alpha", "alpha", "beta", "gamma"]
    ] + [("d2", t) for t in ["beta", "gamma", "gamma", "delta"]]
    df = spark.createDataFrame(rows, "doc string, term string")
    vecs, vocab = term_vectors(df, "doc", "term")
    keep = ["beta", "delta"]
    sel, new_vocab = mathx.feature_select(
        vecs, vocab, keep, vec_col="features", offset=1
    )
    assert new_vocab == ["beta", "delta"]
    out = {r.doc: list(r.features) for r in sel.collect()}
    full = {r.doc: list(r.features) for r in vecs.collect()}
    bi, di = vocab.index("beta") + 1, vocab.index("delta") + 1
    for d in out:
        assert out[d] == [full[d][bi], full[d][di]]


# --- let scope -------------------------------------------------------------


def test_let_sequential_bindings_and_get():
    ctx = LetContext()
    ctx.let(a=[1, 2, 3], b=lambda c: [v * 2 for v in c.get("a")])
    assert ctx.get("b") == [2, 4, 6]
    with pytest.raises(KeyError):
        ctx.get("nope")


def test_memset_and_col(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id int, v double"
    )
    ctx = LetContext()
    ctx.memset(df, cols=["id", "v"], vars=["ids", "vals"], size=2)
    assert len(ctx.get("ids")) == 2 and len(ctx.get("vals")) == 2
    ctx.memset(df, cols=["v"], vars=["allv"])
    assert sorted(ctx.get("allv")) == [10.0, 20.0, 30.0]
    tuples = [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}]
    assert LetContext.col(tuples, "x") == [1, 2]
    with pytest.raises(ValueError):
        ctx.memset(df, cols=["id", "v"], vars=["one"])


def test_object_cache_lifecycle():
    ctx = LetContext()
    assert ctx.put_cache("ws", "k", 42) == 42
    assert ctx.get_cache("ws", "k") == 42
    assert ctx.list_cache() == ["ws"]
    assert ctx.list_cache("ws") == ["k"]
    assert ctx.remove_cache("ws", "k") == 42
    assert ctx.get_cache("ws", "k") is None
    assert ctx.remove_cache("ws", "gone") is None


def test_tuple_echo_run_let():
    ctx = LetContext()
    t = ctx.let(n=3).tuple(n=lambda c: c.get("n"), label="x")
    assert t == {"n": 3, "label": "x"}
    assert LetContext.echo("hi") == {"echo": "hi"}
    out = run_let({"xs": [1.0, 2.0, 3.0]}, lambda c: sum(c.get("xs")))
    assert out == 6.0


def test_ifft_round_trip(spark):
    """ifft(fft(x)) == x (IFFTEvaluator inverse contract)."""
    from solr_spark.functions.evaluators import fft_cols, ifft_cols

    sig = [1.0, 2.0, -1.5, 0.5, 3.0, -2.0, 0.0, 1.0]
    df = spark.createDataFrame([(1, sig)], "id int, x array<double>")
    out = ifft_cols(fft_cols(df, "x"), "fft").first()["signal"]
    assert len(out) == len(sig)
    for a, b in zip(out, sig):
        assert abs(a - b) < 1e-9


def test_kmeans_model_accessors(spark):
    """getCentroids/getCluster read the model tuple's frames; the
    centroids are the exact ones that produced the final assignment."""
    from solr_spark.functions.similarity import (
        get_centroids,
        get_cluster,
        kmeans_model,
    )
    from solr_spark.lets import get_attribute, get_attributes

    pts = (
        [(i, [0.0 + i * 0.01, 0.0]) for i in range(5)]
        + [(10 + i, [10.0 + i * 0.01, 10.0]) for i in range(5)]
    )
    df = spark.createDataFrame(pts, "vec_id int, embedding array<double>")
    model = kmeans_model(df, 2, iters=3)
    cents = get_centroids(model).collect()
    assert [r["cluster_id"] for r in cents] == [1, 2]
    # one centroid near each blob
    xs = sorted(r["c_vec"][0] for r in cents)
    assert abs(xs[0] - 0.02) < 0.1 and abs(xs[1] - 10.02) < 0.1
    # every member of a cluster sits in the same blob
    for cid in (1, 2):
        members = get_cluster(model, df, cid).collect()
        blobs = {r["vec_id"] < 10 for r in members}
        assert len(blobs) == 1
    # getAttribute/getAttributes on the model tuple
    assert get_attribute(model, "k") == 2
    assert set(get_attributes(model)) == {"assignments", "centroids", "k"}


def test_list_plist_union(spark):
    from solr_spark.lets import list_streams, plist

    a = spark.createDataFrame([(1, "a")], "id int, v string")
    b = spark.createDataFrame([(2, "b")], "id int, v string")
    got = sorted((r["id"], r["v"]) for r in list_streams(a, b).collect())
    assert got == [(1, "a"), (2, "b")]
    assert plist is list_streams


def test_memset_over_cap_raises(spark, monkeypatch):
    # an un-sized memset over a stream larger than the cap must raise
    # actionably BEFORE materializing the whole stream on the driver
    import solr_spark.lets as lets_mod

    monkeypatch.setattr(lets_mod, "MEMSET_MAX_ROWS", 5)
    df = spark.range(100).selectExpr("id", "cast(id as double) v")
    ctx = LetContext()
    with pytest.raises(ValueError, match="MEMSET_MAX_ROWS"):
        ctx.memset(df, cols=["v"], vars=["allv"])
    # an explicit size= cap is the documented escape hatch
    ctx.memset(df, cols=["v"], vars=["capped"], size=7)
    assert len(ctx.get("capped")) == 7
