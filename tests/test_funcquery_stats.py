"""Index-stat function-query bridges (ValueSourceParser 'docfreq'/'idf'/
'termfreq'/'tf'/'norm'/'maxdoc'/'numdocs'/'query'/'boost' —
CORE/search/ValueSourceParser.java DocFreqValueSource and siblings),
differentially tested against a raw pandas recount of the same corpus,
plus the registry name-parity contract."""

import math
from collections import Counter

import pytest

from solr_spark.analysis import tokenize_lists
from solr_spark.corpus import corpus_pandas

N_DOCS = 600


@pytest.fixture(scope="module")
def raw_toks():
    pdf = corpus_pandas(0, N_DOCS)
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    return tokenize_lists(pdf["content"]).tolist()


def test_docfreq_idf_termfreq(spark, small_index, raw_toks):
    from solr_spark.functions.funcquery import (
        docfreq_frame,
        idf_frame,
        termfreq_frame,
    )

    terms = ["license", "int", "zz_definitely_absent"]
    got_df = {
        r["term"]: r["docfreq"]
        for r in docfreq_frame(spark, small_index, terms).collect()
    }
    exp_df = {
        t: sum(1 for ts in raw_toks if t in ts) for t in terms
    }
    assert got_df == exp_df
    assert got_df["zz_definitely_absent"] == 0

    n = small_index.n_docs
    got_idf = {
        r["term"]: r["idf"] for r in idf_frame(spark, small_index, terms).collect()
    }
    for t in terms:
        exp = math.log(1.0 + (n - exp_df[t] + 0.5) / (exp_df[t] + 0.5))
        assert got_idf[t] == pytest.approx(exp, rel=1e-12)

    got_tf = {
        (r["docid"], r["term"]): r["termfreq"]
        for r in termfreq_frame(spark, small_index, ["license"]).collect()
    }
    exp_tf = {
        (i, "license"): Counter(ts)["license"]
        for i, ts in enumerate(raw_toks)
        if "license" in ts
    }
    assert got_tf == exp_tf


def test_tf_norm_maxdoc_sttf(spark, small_index, raw_toks):
    from solr_spark.functions.funcquery import (
        REGISTRY,
        maxdoc_value,
        norm_frame,
        numdocs_value,
        tf_frame,
    )

    # norm == exact doclen (lossless vs Lucene's 1-byte norm)
    got_norm = {
        r["docid"]: r["norm"] for r in norm_frame(spark, small_index).collect()
    }
    assert got_norm == {i: len(ts) for i, ts in enumerate(raw_toks)}

    # maxdoc/numdocs literals
    row = (
        spark.range(1)
        .select(
            maxdoc_value(small_index).alias("md"),
            numdocs_value(small_index).alias("nd"),
        )
        .first()
    )
    assert row["md"] == N_DOCS and row["nd"] == N_DOCS

    # tf = BM25-saturated tf: tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    avgdl = small_index.avgdl
    got_tf = {
        r["docid"]: r["tf"]
        for r in tf_frame(spark, small_index, ["license"]).collect()
    }
    for i, ts in enumerate(raw_toks):
        c = Counter(ts)["license"]
        if not c:
            continue
        exp = c * 2.2 / (c + 1.2 * (1 - 0.75 + 0.75 * len(ts) / avgdl))
        assert got_tf[i] == pytest.approx(exp, rel=1e-9), i

    # sumtotaltermfreq from the docs table equals sum of doclens
    sttf = REGISTRY["sumtotaltermfreq"](spark, small_index).first()["sttf"]
    assert sttf == sum(len(ts) for ts in raw_toks)


def test_query_boost_bridges(spark, small_index):
    from solr_spark.functions.funcquery import (
        boost_frame,
        join_query_score,
        query_score_frame,
    )
    from solr_spark.kernel import search

    qf = query_score_frame(spark, small_index, "license")
    top = search(spark, small_index, "license", k=5).collect()
    got = {r["docid"]: r["qscore"] for r in qf.collect()}
    for r in top:
        assert got[r["docid"]] == pytest.approx(r["score"], rel=1e-12)

    # non-matches default to 0.0 when joined onto the docs frame
    docs = spark.read.parquet(small_index.docs_path).select("docid")
    joined = join_query_score(docs, qf, default=0.0)
    n_zero = joined.where("qscore = 0.0").count()
    assert n_zero == N_DOCS - len(got)

    bf = {r["docid"]: r["qscore"] for r in boost_frame(
        spark, small_index, "license", 2.5
    ).collect()}
    for d, s in got.items():
        assert bf[d] == pytest.approx(2.5 * s, rel=1e-12)


def test_registry_name_parity():
    """Every ValueSourceParser.addParser name is either registered or on
    the documented exclusion list (test/diagnostic parsers, currency,
    names owned by other modules)."""
    from solr_spark.functions.funcquery import REGISTRY

    reference_names = set(
        """abs acos agg_avg agg_count agg_countvals agg_hll agg_max agg_min
        agg_missing agg_percentile agg_stddev agg_sum agg_sumsq agg_unique
        agg_uniqueBlock agg_variance and asin atan atan2 boost cbrt ceil
        concat cos cosh def deg dist div docfreq e eq exists exp false field
        floor geodist geohash ghhsin gt gte hsin hypot idf if isnan joindf
        linear literal ln log lt lte map max maxdoc min mod ms norm not
        numdocs or ord pi pow product query rad recip rint rord scale sin
        sinh sqedist sqrt strdist sub sum sumtotaltermfreq tan tanh termfreq
        tf top totaltermfreq true vector vectorSimilarity xor currency""".split()
    )
    # documented exclusions: test/diagnostic (testfunc/threadid/sleep),
    # payload (positions.py), cscore/childfield (collapse / block-join
    # operators, not scalars)
    missing = reference_names - set(REGISTRY)
    assert not missing, f"unregistered parser names: {sorted(missing)}"


def test_ord_rord_high_cardinality(spark):
    """The distributed (range-shuffle) ord/rord path agrees with the
    broadcast-window path."""
    from solr_spark.functions.funcquery import ord_rord

    df = spark.createDataFrame(
        [(i, f"v{i % 37:03d}") for i in range(200)], "id int, v string"
    )
    a = {(r["id"]): (r["ord"], r["rord"]) for r in ord_rord(df, "v").collect()}
    b = {
        (r["id"]): (r["ord"], r["rord"])
        for r in ord_rord(df, "v", high_cardinality=True).collect()
    }
    assert a == b and len(a) == 200


def test_explain_hits(spark, small_index):
    """[explain]: the weighted per-term contribs sum to the hit's BM25
    score (ExplainAugmenterFactory contract)."""
    from solr_spark.kernel import explain_hits

    rows = explain_hits(spark, small_index, "license int", k=5).collect()
    assert len(rows) == 5
    for r in rows:
        parts = r["explain"]
        assert parts and all(p["weight"] == 1 for p in parts)
        assert sum(p["contrib"] for p in parts) == pytest.approx(
            r["score"], rel=1e-9
        )
    # duplicate clause doubles the weight
    dup = explain_hits(spark, small_index, "license license", k=3).collect()
    for r in dup:
        (p,) = r["explain"]
        assert p["weight"] == 2
        assert p["contrib"] == pytest.approx(r["score"], rel=1e-9)


def test_wsum_metric(spark):
    from solr_spark.operators.rollup import rollup, wsum

    df = spark.createDataFrame(
        [("a", 10.0, 1), ("a", 20.0, 3), ("b", 5.0, 2)],
        "g string, v double, c int",
    )
    got = {
        r["g"]: (r["ws"], r["wl"])
        for r in rollup(
            df,
            ["g"],
            [wsum("v", "c").alias("ws"), wsum("v", "c", output_long=True).alias("wl")],
        ).collect()
    }
    assert got["a"][0] == pytest.approx((10 * 1 + 20 * 3) / 4.0)
    assert got["a"][1] == 18
    assert got["b"][0] == pytest.approx(5.0)


def test_currency_conversion(spark):
    """currency(): direct rate, 1/inverse fallback, same-code identity,
    fraction-digit rescaling (CurrencyValue.convertAmount), null for
    unconvertible codes."""
    from pyspark.sql import functions as F

    from solr_spark.functions.funcquery import currency

    rates = {("USD", "EUR"): 0.8, ("EUR", "JPY"): 150.0}
    df = spark.createDataFrame(
        [
            (1, 1000, "USD"),   # 10.00 USD -> 8.00 EUR (direct)
            (2, 1000, "EUR"),   # same code
            (3, 15000, "JPY"),  # 1/inverse: JPY->EUR = 1/150; digits 0->2
            (4, 500, "GBP"),    # no rate either way -> null
        ],
        "id int, amount long, code string",
    )
    out = {
        r["id"]: r["eur"]
        for r in df.select(
            "id",
            currency(
                F.col("amount"), F.col("code"), "EUR", rates,
                fraction_digits={"JPY": 0},
            ).alias("eur"),
        ).collect()
    }
    assert out[1] == 800
    assert out[2] == 1000
    # 15000 JPY (0 digits) -> 100 EUR -> minor units x100 = 10000
    assert out[3] == 10000
    assert out[4] is None


def test_explain_hits_boosted(spark, small_index):
    """[explain] must fold term^boost the same way the scorer does, so the
    weighted contribs still sum to the hit's score for boosted queries."""
    from solr_spark.kernel import explain_hits

    rows = explain_hits(spark, small_index, "license^2.5 int", k=5).collect()
    assert rows
    for r in rows:
        assert sum(p["contrib"] for p in r["explain"]) == pytest.approx(
            r["score"], rel=1e-9
        )
    # rank order preserved after the detail join
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
