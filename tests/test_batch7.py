"""Round-3 batch 7: HyperLogLog sketch, paired/count-dataset tests,
moving MAD, pairSort, outliers, gamma/beta distributions, dbscan, akima,
multiKmeans, termVectors, totaltermfreq — numpy/closed-form mirrors."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_spark.functions import evaluators as ev
from solr_spark.functions import mathx, sketch
from solr_spark.functions.funcquery import REGISTRY


# --- HyperLogLog ----------------------------------------------------------


def test_hll_accuracy_and_merge(spark):
    df = spark.range(0, 12000).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v")
    )
    est = {
        r.g: r.n_hll
        for r in sketch.hll_count_distinct(df, "v", ["g"]).collect()
    }
    exact = {
        r.g: r.n
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    for g, n in exact.items():
        # standard error for p=12 is 1.04/sqrt(4096) ~ 1.6%; allow 5%
        assert abs(est[g] - n) / n < 0.05, (g, est[g], n)
    # sketches merge with max: split/merge == direct
    a = sketch.hll_registers(df.where("id % 2 = 0"), "v", ["g"])
    b = sketch.hll_registers(df.where("id % 2 = 1"), "v", ["g"])
    merged = {
        r.g: r.n_hll
        for r in sketch.hll_estimate(sketch.hll_merge(a, b), ["g"]).collect()
    }
    assert merged == est


def test_hll_matches_python_mirror(spark):
    """Spark estimate == a pure-python HLL over the same md5 registers
    (the same arithmetic the DuckDB gate oracle runs)."""
    import hashlib

    vals = [f"doc-{i}" for i in range(3000)]
    regs: dict[int, int] = {}
    for v in vals:
        h = hashlib.md5(v.encode()).hexdigest()
        bucket = int(h[:3], 16)
        w = h[3:16]
        t = w.lstrip("0")
        if not t:
            rho = 53
        else:
            fv = int(t[0], 16)
            lz = 0 if fv >= 8 else 1 if fv >= 4 else 2 if fv >= 2 else 3
            rho = 4 * (13 - len(t)) + lz + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    m = 4096
    s = sum(1 << (53 - r) for r in regs.values()) / float(1 << 53)
    zeros = m - len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / (s + zeros)
    expected = int(round(m * math.log(m / zeros) if (raw <= 2.5 * m and zeros > 0) else raw))

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = sketch.hll_count_distinct(df, "v").collect()[0].n_hll
    assert got == expected


def test_hll_rejects_bad_precision(spark):
    df = spark.range(3).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        sketch.hll_registers(df, "v", p=10)


# --- hypothesis tests over exact counts ------------------------------------


def test_paired_ttest_mirror(spark):
    rng = np.random.RandomState(7)
    x = rng.normal(10.0, 2.0, 400).round(2)
    y = (x + rng.normal(0.5, 1.0, 400)).round(2)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    row = ev.paired_ttest(df, "x", "y").collect()[0]
    d = x - y
    t_np = d.mean() / (d.std(ddof=1) / math.sqrt(len(d)))
    assert abs(row.t_stat - t_np) < 1e-9
    assert row.df == len(d) - 1
    z = abs(t_np) / math.sqrt(2.0)
    p_np = 2.0 * 0.5 * (1.0 - math.erf(z))
    assert abs(row.p_value - p_np) < 1e-5  # A&S polynomial tolerance


def test_chi_square_dataset_mirror(spark):
    a = [10, 20, 30, 40]
    b = [15, 15, 25, 45]
    df = spark.createDataFrame(list(zip(a, b)), "a long, b long")
    row = ev.chi_square_dataset(df, "a", "b").collect()[0]
    n1, n2 = sum(a), sum(b)
    stat = sum(
        (math.sqrt(n2 / n1) * oa - math.sqrt(n1 / n2) * ob) ** 2 / (oa + ob)
        for oa, ob in zip(a, b)
    )
    assert abs(row.chisq - stat) < 1e-9
    assert row.df == 3
    # p-value helper via regularized incomplete gamma
    p = mathx.chi2_sf(row.chisq, row.df)
    assert 0.0 <= p <= 1.0


def test_gtest_dataset_mirror(spark):
    a = [268, 199, 42]
    b = [807, 759, 184]
    df = spark.createDataFrame(list(zip(a, b)), "a long, b long")
    row = ev.gtest_dataset(df, "a", "b").collect()[0]

    def xlx(v):
        return v * math.log(v) if v > 0 else 0.0

    n1, n2 = sum(a), sum(b)
    n = n1 + n2
    g = 2.0 * (
        sum(xlx(x) + xlx(y) for x, y in zip(a, b))
        - sum(xlx(x + y) for x, y in zip(a, b))
        - (xlx(n1) + xlx(n2))
        + xlx(n)
    )
    assert abs(row.g_stat - g) < 1e-9
    assert row.df == 2


# --- windows / arrays -------------------------------------------------------


def test_moving_mad(spark):
    vals = [4.0, 2.0, 8.0, 6.0, 1.0, 9.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v double"
    )
    out = {
        r.i: r.moving_mad
        for r in ev.moving_mad(df, [], [F.asc("i")], "v", 3).collect()
    }
    assert out[0] is None and out[1] is None  # reference emits full windows only
    for i in range(2, 6):
        w = np.array(vals[i - 2 : i + 1])
        assert abs(out[i] - np.abs(w - w.mean()).mean()) < 1e-12


def test_pair_sort(spark):
    df = spark.createDataFrame(
        [([3.0, 1.0, 2.0], [30.0, 10.0, 20.0])],
        "x array<double>, y array<double>",
    )
    r = df.select(ev.pair_sort(F.col("x"), F.col("y")).alias("p")).collect()[0].p
    assert list(r.x) == [1.0, 2.0, 3.0]
    assert list(r.y) == [10.0, 20.0, 30.0]


def test_outliers(spark):
    rng = np.random.RandomState(3)
    vals = list(rng.normal(50, 5, 500).round(2)) + [500.0, -400.0]
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    out = ev.outliers(df, "v", 0.001, 0.999).collect()
    got = sorted(r.v for r in out)
    assert 500.0 in got and -400.0 in got
    assert len(got) <= 6  # the planted extremes + at most sampling noise


def test_enumerated_and_constant(spark):
    df = spark.createDataFrame([(1,), (2,), (5,)], "k int")
    pmf = df.select(
        ev.enumerated_pmf(F.col("k"), [1, 2, 3], [0.5, 0.3, 0.2]).alias("p")
    ).collect()
    assert [r.p for r in pmf] == [0.5, 0.3, 0.0]
    cdf = df.select(ev.constant_cdf(F.col("k"), 2.0).alias("c")).collect()
    assert [r.c for r in cdf] == [0.0, 1.0, 1.0]


# --- distributions ----------------------------------------------------------


def test_gamma_beta_columns(spark):
    df = spark.createDataFrame([(float(x),) for x in (0.5, 2.0, 5.0)], "x double")
    rows = df.select(
        "x",
        mathx.gamma_pdf(F.col("x"), 3.0, 2.0).alias("gp"),
        mathx.gamma_cdf(F.col("x"), 3.0, 2.0).alias("gc"),
    ).collect()
    for r in rows:
        x = r.x
        pdf = x**2 * math.exp(-x / 2.0) / (math.gamma(3.0) * 8.0)
        erlang = 1 - math.exp(-x / 2.0) * sum(
            (x / 2.0) ** i / math.factorial(i) for i in range(3)
        )
        assert abs(r.gp - pdf) < 1e-12
        assert abs(r.gc - erlang) < 1e-10
    b = spark.createDataFrame([(0.25,), (0.5,)], "x double")
    out = b.select(
        "x",
        mathx.beta_pdf(F.col("x"), 2.0, 3.0).alias("bp"),
        mathx.beta_cdf(F.col("x"), 2.0, 3.0).alias("bc"),
    ).collect()
    from math import comb

    for r in out:
        x = r.x
        pdf = x * (1 - x) ** 2 / (math.gamma(2) * math.gamma(3) / math.gamma(5))
        cdf = sum(comb(4, j) * x**j * (1 - x) ** (4 - j) for j in range(2, 5))
        assert abs(r.bp - pdf) < 1e-12
        assert abs(r.bc - cdf) < 1e-10


# --- geometry / clustering / interpolation ---------------------------------


def test_dbscan_column(spark):
    pts = [[0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [5.0, 5.0], [5.1, 5.0], [5.0, 5.1], [99.0, 99.0]]
    df = spark.createDataFrame([(pts,)], "pts array<array<double>>")
    lab = df.select(mathx.dbscan(F.col("pts"), 0.5, 3).alias("l")).collect()[0].l
    assert lab[:3] == [1, 1, 1] and lab[3:6] == [2, 2, 2] and lab[6] == -1


def test_akima_column(spark):
    df = spark.createDataFrame(
        [([0.0, 1.0, 2.0, 3.0, 4.0], [0.0, 1.0, 4.0, 9.0, 16.0], [1.5, 2.5])],
        "x array<double>, y array<double>, at array<double>",
    )
    got = df.select(
        mathx.akima_predict(F.col("x"), F.col("y"), F.col("at")).alias("p")
    ).collect()[0].p
    # akima through y=x^2 knots interpolates x^2 closely between knots
    assert abs(got[0] - 2.25) < 0.15 and abs(got[1] - 6.25) < 0.15


def test_multi_kmeans(spark):
    from solr_spark.functions.similarity import kmeans, multi_kmeans

    rng = np.random.RandomState(11)
    # interleave ids so the deterministic lowest-id seeds span the blobs
    blobs = [
        (j * 3 + cidx, [float(x) for x in rng.normal(c, 0.3, 4)])
        for cidx, c in enumerate((0.0, 10.0, 20.0))
        for j in range(50)
    ]
    df = spark.createDataFrame(blobs, "vec_id long, embedding array<double>")
    out = multi_kmeans(df, 3, trials=2, iters=3)
    sizes = sorted(
        r.n for r in out.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    )
    assert sizes == [50, 50, 50]
    # trial 0 is plain kmeans — multi must never be worse, and stays deterministic
    again = multi_kmeans(df, 3, trials=2, iters=3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_term_vectors(spark):
    from solr_spark.functions.classify import term_vectors

    rows = [
        (1, "spark"), (1, "index"), (1, "spark"),
        (2, "spark"), (2, "query"),
        (3, "rare"),
    ]
    df = spark.createDataFrame(rows, "doc long, term string")
    vecs, vocab = term_vectors(df, "doc", "term", min_df=1, max_df_ratio=1.0)
    assert vocab == ["index", "query", "rare", "spark"]
    got = {r.doc: r for r in vecs.collect()}
    assert len(got) == 3
    # doc1 has tf(spark)=2 — its slot (1+index of 'spark') carries 2*idf
    spark_slot = 1 + vocab.index("spark")
    idf_spark = math.log(3 / (2 + 1.0))
    assert abs(got[1].features[spark_slot] - 2 * idf_spark) < 1e-9
    # min_df pruning drops the singleton
    _, vocab2 = term_vectors(df, "doc", "term", min_df=2)
    assert vocab2 == ["spark"]


# --- index stats / registry -------------------------------------------------


def test_total_term_freq(spark, small_index):
    from solr_spark.kernel import sum_total_term_freq, total_term_freq

    # query two terms that actually exist in the code-corpus vocabulary
    # (the synthetic corpus is identifier-shaped — don't hardcode English)
    post = spark.read.parquet(small_index.postings_path)
    terms = [r.term for r in post.select("term").distinct().limit(2).collect()]
    ttf = {r.term: r.ttf for r in total_term_freq(spark, small_index, terms).collect()}
    assert ttf and all(v > 0 for v in ttf.values())
    sttf = sum_total_term_freq(spark, small_index).collect()[0].sttf
    assert sttf >= sum(ttf.values())


def test_agg_aliases_and_primes():
    assert REGISTRY["agg_sum"] is not None
    assert "agg_hll_sketch" in REGISTRY and "agg_unique" in REGISTRY
    assert mathx.primes(5, 10) == [11, 13, 17, 19, 23]
