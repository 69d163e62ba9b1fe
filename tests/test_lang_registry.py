"""Reference-name parity: solr_spark.lang.registry() must cover every
function name Lang.java registers (the ``withFunctionName`` calls in
solrj-streaming/.../io/Lang.java:337-498), either with an implementation
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
