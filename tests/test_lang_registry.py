"""Reference-name parity: solr_spark.lang.registry() must cover every
function name Lang.java registers (the ``withFunctionName`` calls in
solrj-streaming/.../io/Lang.java:337-638), either with an implementation
or an explicit, reasoned exclusion.

LANG_NAMES below is the frozen list extracted from the reference at
/root/reference (305 unique names: 294 unique string literals —
duplicates in Lang.java collapsed — plus the 11 temporal evaluators
registered via TemporalEvaluator*.FUNCTION_NAME constants at
Lang.java:625-638, plus the multi-line multiVariateNormalDistribution
literal at Lang.java:512-513). Frozen so the test runs without the
reference tree present.
"""

from solr_spark import lang

LANG_NAMES = [
    "abs", "acos", "add", "addAll", "akima", "and", "anova",
    "append", "array", "asc", "asin", "atan", "avg", "betaDistribution",
    "bicubicSpline", "binomialCoefficient", "binomialDistribution", "calc", "canberra", "cartesianProduct", "cbrt",
    "ceil", "cell", "chebyshev", "chiSquareDataSet", "coalesce", "col", "colAt",
    "columnCount", "commit", "complement", "concat", "constantDistribution", "conv", "convert",
    "convexHull", "copyOf", "copyOfRange", "corr", "corrPValues", "cos", "cosh",
    "cosine", "cosineSimilarity", "count", "countDist", "cov", "cumulativeProbability", "daemon",
    "dateTime", "dbscan", "delete", "density", "derivative", "describe", "diff",
    "distance", "distinct", "div", "dotProduct", "double", "drill", "earthMovers",
    "ebeAdd", "ebeDivide", "ebeMultiply", "ebeSubtract", "echo", "empiricalDistribution", "enclosingDisk",
    "enumeratedDistribution", "eor", "eq", "euclidean", "eval", "executor", "expMovingAvg",
    "export", "facet", "facet2D", "factorial", "featureSelect", "features", "fetch",
    "fft", "finddelay", "floor", "freqTable", "fuzzyKmeans", "gammaDistribution", "gatherNodes",
    "gaussfit", "geometricDistribution", "get", "getAmplitude", "getAngularFrequency", "getArea", "getAttribute",
    "getAttributes", "getBaryCenter", "getBoundarySize", "getCache", "getCenter", "getCentroids", "getCluster",
    "getColumnLabels", "getMembershipMatrix", "getPhase", "getRadius", "getRowLabels", "getSupportPoints", "getValue",
    "getVertices", "grandSum", "group", "gt", "gteq", "gtestDataSet", "harmfit",
    "harmonicFit", "hashJoin", "hashRollup", "having", "hist", "if", "ifft",
    "indexOf", "innerJoin", "input", "integral", "intersect", "isNull", "kmeans",
    "knn", "knnRegress", "knnSearch", "kolmogorovSmirnov", "ks", "l1norm", "l2norm",
    "latlonVectors", "leftOuterJoin", "length", "lerp", "let", "linfnorm", "list",
    "listCache", "loess", "log", "log10", "logNormalDistribution", "long", "lower",
    "lt", "lteq", "ltrim", "manhattan", "mannWhitney", "markovChain", "matches",
    "matrix", "matrixMult", "max", "mean", "meanDifference", "memset", "merge",
    "min", "minMaxScale", "mod", "mode", "model", "monteCarlo", "movingAvg",
    "movingMAD", "movingMedian", "mult", "multiKmeans", "natural", "nodes", "noop",
    "normalDistribution", "normalizeSum", "not", "notNull", "null", "olsRegress", "ones",
    "or", "oscillate", "outerHashJoin", "outliers", "pairSort", "pairedTtest", "parallel",
    "parseCSV", "parseTSV", "per", "percentile", "pivot", "plist", "plot",
    "poissonDistribution", "polyfit", "pow", "precision", "predict", "primes", "priority",
    "probability", "projectToBorder", "putCache", "random", "rank", "recNum", "recip",
    "reduce", "regress", "removeCache", "repeat", "replace", "rev", "rollup",
    "round", "rowAt", "rowCount", "rtrim", "sample", "scalarAdd", "scalarDivide",
    "scalarMultiply", "scalarSubtract", "scale", "scoreNodes", "search", "select", "sequence",
    "setColumnLabels", "setRowLabels", "setValue", "shortestPath", "shuffle", "significantTerms", "sin",
    "sinh", "sort", "spline", "split", "sql", "sqrt", "standardize",
    "stats", "std", "stddev", "stream", "sub", "sum", "sumColumns",
    "sumDifference", "sumRows", "sumSq", "tan", "tanh", "termVectors", "timeseries",
    "top", "topFeatures", "topic", "train", "transpose", "triangularDistribution", "trim",
    "trunc", "ttest", "tuple", "uniformDistribution", "uniformIntegerDistribution", "unique", "unitize",
    "update", "upper", "uuid", "val", "valueAt", "var", "weibullDistribution",
    "withField", "withValue", "zeros", "zipFDistribution", "zplot", "zscores",
    # constant-based registrations (TemporalEvaluator*.FUNCTION_NAME,
    # Lang.java:625-638) + the multi-line literal at Lang.java:512-513
    "year", "month", "day", "dayOfYear", "hour", "minute", "second",
    "epoch", "week", "quarter", "dayOfQuarter",
    "multiVariateNormalDistribution",
]


def test_frozen_list_shape():
    assert len(LANG_NAMES) == 305
    assert len(set(LANG_NAMES)) == 305


def test_temporal_evaluators_are_column_adapters():
    r = lang.registry()
    from pyspark.sql import Column
    for n in ("year", "month", "day", "dayOfYear", "hour", "minute",
              "second", "epoch", "week", "quarter", "dayOfQuarter"):
        assert callable(r[n]), n


def test_mvn_distribution_object():
    r = lang.registry()
    mvn = r["multiVariateNormalDistribution"]
    assert isinstance(mvn, dict) and callable(mvn["pdf"]) and callable(mvn["sample"])


def test_every_lang_name_resolved_or_excluded():
    r = lang.registry()
    missing = [n for n in LANG_NAMES if n not in r and n not in lang.EXCLUDED]
    assert missing == []


def test_no_name_both_registered_and_excluded():
    r = lang.registry()
    both = [n for n in lang.EXCLUDED if n in r]
    assert both == []


def test_registry_values_are_implementations():
    for name, impl in lang.registry().items():
        if isinstance(impl, dict):
            assert impl and all(callable(v) for v in impl.values()), name
        else:
            assert callable(impl), name


def test_exclusions_are_reasoned_and_few():
    assert len(lang.EXCLUDED) <= 6
    for name, reason in lang.EXCLUDED.items():
        assert len(reason) > 20, name


def test_resolve_contract():
    import pytest

    assert callable(lang.resolve("movingAvg"))
    with pytest.raises(NotImplementedError, match="visualization"):
        lang.resolve("plot")
    with pytest.raises(KeyError):
        lang.resolve("noSuchFunction")


def test_distribution_protocol_dispatch():
    import pytest

    dist = {"pmf": lambda x: ("pmf", x), "cdf": lambda x: ("cdf", x)}
    assert lang.probability(dist, 3) == ("pmf", 3)
    assert lang.cumulative_probability(dist, 3) == ("cdf", 3)
    with pytest.raises(NotImplementedError, match="cdf"):
        lang.sample(dist)
    cont = {"pdf": lambda x: ("pdf", x)}
    assert lang.density(cont, 1) == ("pdf", 1)
    assert lang.probability(cont, 1) == ("pdf", 1)


def test_temporal_evaluator_values(spark):
    """ISO semantics pinned against Python's datetime.isocalendar:
    Spark weekofyear IS IsoFields.WEEK_OF_WEEK_BASED_YEAR
    (TemporalEvaluatorWeek.java:39), epoch is MILLIseconds
    (TemporalEvaluatorEpoch.java:40), dayOfQuarter is 1-based."""
    import datetime

    r = lang.registry()
    rows = [
        ("2021-01-01 10:30:45",),  # ISO week 53 of 2020
        ("2024-02-29 23:59:59",),  # leap day, Q1 day 60
        ("2026-08-19 00:00:00",),
        ("2019-12-30 12:00:00",),  # ISO week 1 of 2020
    ]
    df = spark.createDataFrame(rows, "ts string")
    out = df.select(
        "ts",
        r["year"]("ts").alias("y"), r["month"]("ts").alias("mo"),
        r["day"]("ts").alias("d"), r["dayOfYear"]("ts").alias("doy"),
        r["hour"]("ts").alias("h"), r["minute"]("ts").alias("mi"),
        r["second"]("ts").alias("s"), r["week"]("ts").alias("w"),
        r["quarter"]("ts").alias("q"), r["dayOfQuarter"]("ts").alias("dq"),
        r["epoch"]("ts").alias("ep"),
    ).collect()
    for row in out:
        dt = datetime.datetime.fromisoformat(row["ts"])
        assert row["y"] == dt.year and row["mo"] == dt.month
        assert row["d"] == dt.day
        assert row["doy"] == dt.timetuple().tm_yday
        assert (row["h"], row["mi"], row["s"]) == (dt.hour, dt.minute, dt.second)
        assert row["w"] == dt.isocalendar()[1]
        assert row["q"] == (dt.month - 1) // 3 + 1
        q_start = datetime.date(dt.year, 3 * ((dt.month - 1) // 3) + 1, 1)
        assert row["dq"] == (dt.date() - q_start).days + 1
        # epoch: session timezone is UTC, so the wall time IS the instant
        assert row["ep"] == int(
            dt.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000
        )
