"""Stream-evaluator library: the reference's math/stats evaluators
re-expressed as Catalyst Column builders.

Reference registry: /root/reference/solr/solrj-streaming/src/java/org/
apache/solr/client/solrj/io/Lang.java:419-498 (249 evaluators registered
over the eval/ package — ArcCosineEvaluator, CorrelationEvaluator:429,
MovingAverageEvaluator:436, RegressionEvaluator, CumulativeSum via
running-total lambdas, ...). The reference evaluates these row-at-a-time
inside the streaming tuple loop; here every evaluator is a JVM-side
Catalyst expression (scalar), a group aggregate, a partitioned window, or
an array (vector) expression — whole-stage-codegen'd, never per-row
Python.

Determinism note for the aggregate family: corr/covariance/regression are
computed from EXACT decimal-cast moments (n, Σx, Σy, Σxy, Σx², Σy² — all
exact when inputs are fixed-point), then combined in one deterministic
double expression. This both sidesteps Spark's merge-order fp wobble and
matches the closed-form the DuckDB oracles use bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# scalar evaluators (Lang.java one-arg/two-arg math family) — name → builder
SCALAR = {
    "abs": F.abs,
    "ceil": F.ceil,
    "floor": F.floor,
    "round": F.round,
    "sqrt": F.sqrt,
    "cbrt": F.cbrt,
    "exp": F.exp,
    "ln": F.log,
    "log10": F.log10,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "asin": F.asin,
    "acos": F.acos,
    "atan": F.atan,
    "sinh": F.sinh,
    "cosh": F.cosh,
    "tanh": F.tanh,
    "pow": F.pow,
    "mod": lambda a, b: a % b,
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mult": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "if": F.when,  # if(cond, then).otherwise(...)
    "eq": lambda a, b: a == b,
    "gt": lambda a, b: a > b,
    "gteq": lambda a, b: a >= b,
    "lt": lambda a, b: a < b,
    "lteq": lambda a, b: a <= b,
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "not": lambda a: ~a,
}

# vector (array-column) evaluators — the reference's list-valued family
VECTOR = {
    "length": F.size,
    "rev": F.reverse,
    "arraySort": F.sort_array,
    "distinct": F.array_distinct,
    "dotProduct": lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ),
    "euclidean": lambda a, b: F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    ),
    "manhattan": lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ),
    "cosineSimilarity": lambda a, b: VECTOR["dotProduct"](a, b)
    / (
        F.sqrt(VECTOR["dotProduct"](a, a)) * F.sqrt(VECTOR["dotProduct"](b, b))
    ),
}


def _dec(c: Column | str, scale: int = 4, width: int = 18) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({width},{scale})")


def exact_moments(x: Column | str, y: Column | str, scale: int = 4) -> list[Column]:
    """The six exact moments behind corr/cov/regression — decimal-cast
    sums (exact for fixed-point inputs), emitted as doubles. Width 19:
    int128-backed in DuckDB (width-18 decimals are int64 and overflow in
    the Σxy/Σx² products), and the product width 38 still fits both
    engines' caps."""
    xd, yd = _dec(x, scale, 19), _dec(y, scale, 19)
    return [
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
    ]


def corr_expr() -> Column:
    """Pearson correlation from exact moments (CorrelationEvaluator,
    Lang.java:429): (n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²))."""
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )


def regress_exprs() -> tuple[Column, Column]:
    """OLS slope/intercept from exact moments (RegressionEvaluator /
    OLSRegressionEvaluator): slope = (n·Σxy − Σx·Σy)/(n·Σxx − Σx²),
    intercept = (Σy − slope·Σx)/n."""
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return slope, intercept


def corr_regress(df: DataFrame, x: str, y: str, scale: int = 4) -> DataFrame:
    """One-row (corr, slope, intercept) over the frame — the aggregate
    evaluators wired through exact moments (one map-side-combined pass)."""
    m = df.agg(*exact_moments(x, y, scale))
    slope, intercept = regress_exprs()
    return m.select(
        corr_expr().alias("corr"), slope.alias("slope"), intercept.alias("intercept")
    )


def moving_avg(
    df: DataFrame,
    part_cols: list[str],
    order: list[Column],
    value: str,
    window: int,
    out_col: str = "moving_avg",
    scale: int = 2,
) -> DataFrame:
    """movingAvg (MovingAverageEvaluator, Lang.java:436) over a
    PARTITIONED window — the partition keys are mandatory (a sliding
    window over an unpartitioned 100-TB stream is a single-task plan; the
    reference evaluates per-tuple over an already-sorted stream, the
    partitioned window is the distributed equivalent). Exact decimal sum
    over the frame divided by the frame count, emitted as double."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(-(window - 1), 0)
    )
    # cast the exact decimal sum to double BEFORE dividing — the oracle
    # does CAST(sum(...) AS DOUBLE)/count, and decimal-vs-double division
    # rounds differently
    return df.withColumn(
        out_col,
        F.sum(_dec(value, scale)).over(w).cast("double")
        / F.count(F.lit(1)).over(w),
    )


def diff_lag(
    df: DataFrame,
    part_cols: list[str],
    order: list[Column],
    value: str,
    out_col: str = "diff",
) -> DataFrame:
    """diff (DifferenceEvaluator): first difference of ``value`` within
    each partition under ``order`` (lag-1 subtraction)."""
    w = Window.partitionBy(*part_cols).orderBy(*order)
    return df.withColumn(out_col, F.col(value) - F.lag(value, 1).over(w))


def cumulative_sum(
    df: DataFrame,
    part_cols: list[str],
    order: list[Column],
    value: str,
    out_col: str = "cumsum",
    scale: int = 2,
) -> DataFrame:
    """Running total within each partition (the reference's cumulative
    lambdas over sorted streams) — exact decimal accumulation."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        out_col, F.sum(_dec(value, scale)).over(w).cast("double")
    )


def zscore(df: DataFrame, value: str, out_col: str = "zscore") -> DataFrame:
    """normalize/standardize (NormalizeEvaluator): (x − μ)/σ via a
    broadcast one-row stats join (no window over the full frame)."""
    stats = df.agg(
        F.avg(value).alias("__mu"), F.stddev_pop(value).alias("__sigma")
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out_col, (F.col(value) - F.col("__mu")) / F.col("__sigma"))
        .drop("__mu", "__sigma")
    )
