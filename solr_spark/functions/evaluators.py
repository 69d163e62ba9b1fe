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

# third batch — the remaining common one/two-arg math evaluators
# (Lang.java scalar family), all straight builtin mappings
SCALAR.update(
    {
        "atan2": F.atan2,
        "hypot": F.hypot,
        "expm1": F.expm1,
        "log1p": F.log1p,
        "sgn": F.signum,
        "degrees": F.degrees,
        "radians": F.radians,
        "cbrt": F.cbrt,
        "factorial": F.factorial,
        "greatest": F.greatest,
        "least": F.least,
    }
)


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

# second batch of the vector family (mean/variance/scale/unitize — the
# reference's descriptive and transform evaluators over list values)
VECTOR.update(
    {
        "mean": lambda a: F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v
        )
        / F.size(a),
        "variance": lambda a: F.aggregate(  # population variance: E[x²]−E[x]²
            a, F.lit(0.0), lambda acc, v: acc + v * v
        )
        / F.size(a)
        - (VECTOR["mean"](a) * VECTOR["mean"](a)),
        "scale": lambda k, a: F.transform(a, lambda v: k * v),
        "unitize": lambda a: F.transform(
            a, lambda v: v / F.sqrt(VECTOR["dotProduct"](a, a))
        ),
        "norm2": lambda a: F.sqrt(VECTOR["dotProduct"](a, a)),
    }
)

# element-wise vector arithmetic (ebeAdd/ebeSubtract/ebeMultiply/ebeDivide)
# and generators (zeros/ones/sequence) — the reference's matrix-math family
VECTOR.update(
    {
        "ebeAdd": lambda a, b: F.zip_with(a, b, lambda x, y: x + y),
        "ebeSubtract": lambda a, b: F.zip_with(a, b, lambda x, y: x - y),
        "ebeMultiply": lambda a, b: F.zip_with(a, b, lambda x, y: x * y),
        "ebeDivide": lambda a, b: F.zip_with(a, b, lambda x, y: x / y),
        "zeros": lambda n: F.array_repeat(F.lit(0.0), n),
        "ones": lambda n: F.array_repeat(F.lit(1.0), n),
        "sequence": lambda start, stop, by: F.transform(
            F.sequence(start, stop, by), lambda x: x.cast("double")
        ),
        "copyOfRange": lambda a, lo, hi: F.slice(a, lo + 1, hi - lo),
    }
)


def _dec(c: Column | str, scale: int = 4, width: int = 18) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({width},{scale})")


def exact_moments(x: Column | str, y: Column | str, scale: int = 4) -> list[Column]:
    """The six exact moments behind corr/cov/regression — decimal-cast
    sums (exact for fixed-point inputs), emitted as doubles.

    Spark side uses width 18: an 18x18 product is decimal(37, 2*scale),
    UNDER Spark's 38-precision cap, so the product stays exact (width 19
    would make a precision-39 product that Spark silently rounds to
    scale 7 — divergence from the oracle for >3-decimal inputs). The
    DuckDB oracles keep DECIMAL(19,4): their 38-precision product is
    also exact, and both sides emit the same double."""
    xd, yd = _dec(x, scale, 18), _dec(y, scale, 18)
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


def moving_median(
    df: DataFrame,
    part_cols: list[str],
    order: list[Column],
    value: str,
    window: int,
    out_col: str = "moving_median",
) -> DataFrame:
    """movingMedian (MovingMedianEvaluator, Lang.java window family):
    exact median over a trailing row frame. Spark has no holistic median
    window function, so the frame's values ride a sorted array (frames
    are small by construction — ``window`` rows) and the median is the
    interpolated middle, matching DuckDB's window median semantics."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(-(window - 1), 0)
    )
    arr = F.sort_array(F.collect_list(F.col(value).cast("double")).over(w))
    n = F.size(arr)
    odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
    even = (
        F.element_at(arr, (n / 2).cast("int"))
        + F.element_at(arr, (n / 2 + 1).cast("int"))
    ) / 2.0
    return df.withColumn(out_col, F.when(n % 2 == 1, odd).otherwise(even))


def covariance(df: DataFrame, x: str, y: str, scale: int = 4) -> DataFrame:
    """cov (CovarianceEvaluator, Lang.java:430): one-row population and
    sample covariance from the same exact decimal moments as corr —
    cov_pop = (Σxy − Σx·Σy/n)/n, cov_samp = (Σxy − Σx·Σy/n)/(n−1)."""
    m = df.agg(*exact_moments(x, y, scale))
    n, sx, sy, sxy = F.col("n"), F.col("sx"), F.col("sy"), F.col("sxy")
    return m.select(
        ((sxy - sx * sy / n) / n).alias("cov_pop"),
        ((sxy - sx * sy / n) / (n - F.lit(1.0))).alias("cov_samp"),
    )


def percent_rank(
    df: DataFrame,
    part_cols: list[str],
    order: list[Column],
    out_col: str = "pct_rank",
) -> DataFrame:
    """percentRank / rank-transform evaluator: (rank−1)/(n−1) within each
    partition — both engines implement the identical SQL-standard
    definition, so values match bit-for-bit."""
    w = Window.partitionBy(*part_cols).orderBy(*order)
    return df.withColumn(out_col, F.percent_rank().over(w))


def describe(df: DataFrame, value: str, scale: int = 2) -> DataFrame:
    """describe (DescribeEvaluator): one-row summary — count, exact
    decimal mean, min/max, and interpolated quartiles (Spark `percentile`
    and DuckDB `quantile_cont` share the linear-interpolation
    definition)."""
    v = F.col(value).cast("double")
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(_dec(value, scale)).cast("double") / F.count(F.lit(1))).alias("mean"),
        F.min(v).alias("min"),
        F.expr(f"percentile({value}, 0.25)").alias("p25"),
        F.expr(f"percentile({value}, 0.5)").alias("p50"),
        F.expr(f"percentile({value}, 0.75)").alias("p75"),
        F.max(v).alias("max"),
    )


def ema(
    df: DataFrame,
    part_cols: list[str],
    order: list[Column],
    value: str,
    alpha: float,
    out_col: str = "ema",
) -> DataFrame:
    """expMovingAvg (ExponentialMovingAverageEvaluator): within each
    partition, ema_0 = x_0; ema_i = α·x_i + (1−α)·ema_{i−1}.

    The recurrence is inherently sequential, but only WITHIN a partition
    key — so each group's ordered values ride one array (groups are
    bounded: a day, a device, a user) and the recurrence folds JVM-side
    with F.aggregate, then explodes back to rows. No Python, no global
    sort; parallelism = number of groups, the same contract as the
    reference's per-stream evaluation."""
    a = float(alpha)
    w = Window.partitionBy(*part_cols).orderBy(*order)
    with_rn = df.withColumn("__rn", F.row_number().over(w))
    grouped = with_rn.groupBy(*part_cols).agg(
        F.array_sort(
            F.collect_list(F.struct("__rn", F.col(value).cast("double").alias("__v")))
        ).alias("__a")
    )
    emas = F.aggregate(
        F.col("__a"),
        F.expr("CAST(array() AS ARRAY<DOUBLE>)"),
        lambda acc, s: F.when(F.size(acc) == 0, F.array(s["__v"])).otherwise(
            F.concat(
                acc,
                F.array(
                    F.lit(a) * s["__v"] + F.lit(1.0 - a) * F.element_at(acc, -1)
                ),
            )
        ),
    )
    exploded = grouped.withColumn("__e", emas).select(
        *part_cols,
        F.posexplode(
            F.arrays_zip(F.col("__a"), F.col("__e").alias("__ema"))
        ).alias("__pos", "__z"),
    )
    flat = exploded.select(
        *part_cols,
        F.col("__z.__a.__rn").alias("__rn"),
        F.col("__z.__ema").alias(out_col),
    )
    return with_rn.join(flat, [*part_cols, "__rn"]).drop("__rn")


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
