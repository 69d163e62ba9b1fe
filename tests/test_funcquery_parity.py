"""ValueSourceParser name parity: funcquery.REGISTRY (plus the reasoned
EXCLUDED_VSP list) must cover every function-query name the reference
registers (CORE/search/ValueSourceParser.java addParser calls).

VSP_NAMES below is the frozen list extracted from the reference at
/root/reference (81 unique names across the three registration styles:
inline addParser("name", ...), multi-line addParser( \n "name", and
new NamedParser("name")). Frozen so the test runs without the reference
tree present.
"""

from solr_spark.functions import funcquery

VSP_NAMES = [
    "abs", "agg", "agg_", "agg_avg", "agg_count", "agg_countvals",
    "agg_hll", "agg_max", "agg_min", "agg_missing", "agg_multistat",
    "agg_percentile", "agg_stddev", "agg_sum", "agg_sumsq", "agg_unique",
    "agg_uniqueBlock", "agg_variance", "and", "boost", "childfield",
    "concat", "cscore", "currency", "def", "dist", "div", "docfreq",
    "e", "eq", "exists", "false", "field", "geodist", "geohash",
    "ghhsin", "gt", "gte", "hsin", "idf", "if", "isnan", "joindf",
    "linear", "literal", "lt", "lte", "map", "max", "maxdoc", "min",
    "mod", "ms", "norm", "not", "numdocs", "or", "ord", "payload",
    "pi", "product", "query", "recip", "rord", "scale", "sleep",
    "sqedist", "strdist", "sub", "sum", "sumtotaltermfreq", "termfreq",
    "testfunc", "tf", "threadid", "top", "totaltermfreq", "true",
    "vector", "vectorSimilarity", "xor",
]


def test_frozen_list_shape():
    assert len(VSP_NAMES) == 81
    assert len(set(VSP_NAMES)) == 81


def test_every_parser_name_registered_or_excluded():
    missing = [
        n for n in VSP_NAMES
        if n not in funcquery.REGISTRY and n not in funcquery.EXCLUDED_VSP
    ]
    assert missing == []


def test_no_name_both_registered_and_excluded():
    both = [n for n in funcquery.EXCLUDED_VSP if n in funcquery.REGISTRY]
    assert both == []


def test_exclusions_are_reasoned_debug_utilities():
    assert set(funcquery.EXCLUDED_VSP) == {"testfunc", "threadid", "sleep"}
    for reason in funcquery.EXCLUDED_VSP.values():
        assert len(reason) > 20


def test_agg_dispatch_routes_to_metric(spark):
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    col = funcquery.REGISTRY["agg"]("sum", F.col("x"))
    assert isinstance(col, Column)
    # the dispatcher must agree with the direct agg_ registration
    row = (
        spark.createDataFrame([(1,), (2,), (3,)], "x int")
        .agg(col.alias("s"), funcquery.REGISTRY["agg_sum"](F.col("x")).alias("d"))
        .collect()[0]
    )
    assert row["s"] == row["d"] == 6


def test_agg_dispatch_unknown_metric_raises():
    import pytest

    with pytest.raises(KeyError, match="nosuch"):
        funcquery.agg_dispatch("nosuch")


def test_cscore_is_score_column(spark):
    from pyspark.sql import Column

    assert isinstance(funcquery.cscore(), Column)


def test_file_exchange_rate_provider(tmp_path, spark):
    from pyspark.sql import functions as F

    from solr_spark.functions.funcquery import (
        FileExchangeRateProvider, currency)

    p = tmp_path / "currency.xml"
    p.write_text('<currencyConfig version="1.0"><rates>'
                 '<rate from="USD" to="EUR" rate="0.5"/>'
                 '<rate from="USD" to="JPY" rate="100.0"/>'
                 '</rates></currencyConfig>')
    clock = [0.0]
    prov = FileExchangeRateProvider(str(p), refresh_interval_s=60,
                                    _clock=lambda: clock[0])
    assert prov.rates() == {("USD", "EUR"): 0.5, ("USD", "JPY"): 100.0}
    df = spark.createDataFrame([(1000, "USD")], "amt long, code string")
    got = df.select(
        currency(F.col("amt"), F.col("code"), "EUR",
                 prov.rates()).alias("eur")).collect()[0]["eur"]
    assert got == 500
    # file changes: before the interval elapses the old table is served,
    # after it the provider reloads (the reference's refreshInterval)
    import os, time
    p.write_text('<currencyConfig version="1.0"><rates>'
                 '<rate from="USD" to="EUR" rate="0.25"/>'
                 '</rates></currencyConfig>')
    os.utime(p, (time.time() + 10, time.time() + 10))
    clock[0] = 30.0
    assert prov.rates()[("USD", "EUR")] == 0.5   # interval not elapsed
    clock[0] = 61.0
    assert prov.rates() == {("USD", "EUR"): 0.25}  # reloaded
