"""Function-query registry: the reference's ValueSourceParser surface as
named Column builders.

Reference registry: /root/reference/solr/core/src/java/org/apache/solr/
search/ValueSourceParser.java:146-1397 (each `addParser("name", ...)`
maps a function-query name to a ValueSource). Here each name maps to a
pyspark Column builder — whole-stage-codegen'd JVM expressions, the
"function queries are Columns" stance of SURVEY §2.7. The handful that
need corpus statistics (`scale`) take them via a one-row broadcast join
rather than a driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def recip(x: Column, m: float, a: float, b: float) -> Column:
    """recip(x,m,a,b) = a / (m*x + b) — the classic date-boost shape
    (ReciprocalFloatFunction; ValueSourceParser 'recip')."""
    return F.lit(float(a)) / (F.lit(float(m)) * x + F.lit(float(b)))


def map_val(x: Column, lo: float, hi: float, target: float) -> Column:
    """map(x,min,max,target): values inside [min,max] become target,
    others pass through (RangeMapFloatFunction)."""
    return F.when(
        (x >= F.lit(float(lo))) & (x <= F.lit(float(hi))), F.lit(float(target))
    ).otherwise(x)


def linear(x: Column, m: float, c: float) -> Column:
    """linear(x,m,c) = m*x + c (LinearFloatFunction)."""
    return F.lit(float(m)) * x + F.lit(float(c))


def scale_to(df: DataFrame, x: Column, min_to: float, max_to: float) -> DataFrame:
    """scale(x,minTarget,maxTarget): rescale the column's observed
    [min,max] onto the target range (ScaleFloatFunction — the reference
    computes the field's min/max from the index; here a one-row
    aggregate broadcast into the plan, no driver round-trip). Returns
    ``df`` with a ``scaled`` column."""
    stats = df.agg(F.min(x).alias("__mn"), F.max(x).alias("__mx"))
    span = F.col("__mx") - F.col("__mn")
    scaled = F.when(span == 0, F.lit(float(min_to))).otherwise(
        F.lit(float(min_to))
        + (x - F.col("__mn")) / span * F.lit(float(max_to - min_to))
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("scaled", scaled)
        .drop("__mn", "__mx")
    )


def if_fn(cond: Column, then: Column, otherwise: Column) -> Column:
    return F.when(cond, then).otherwise(otherwise)


def exists_fn(x: Column) -> Column:
    return x.isNotNull()


def def_fn(x: Column, default) -> Column:
    """def(x,d): x if it exists else d (DefFunction)."""
    return F.coalesce(x, F.lit(default))


# name → builder, 1:1 with ValueSourceParser.addParser names. Multi-arg
# arithmetic (sum/product/min/max) folds left like the reference's
# MultiFloatFunction evaluation order.
def _fold(op):
    def g(*cols):
        acc = cols[0]
        for c in cols[1:]:
            acc = op(acc, c)
        return acc

    return g


REGISTRY: dict[str, "callable"] = {
    "sum": _fold(lambda a, b: a + b),
    "sub": lambda a, b: a - b,
    "product": _fold(lambda a, b: a * b),
    "div": lambda a, b: a / b,
    "mod": lambda a, b: a % b,
    "abs": F.abs,
    "pow": F.pow,
    "sqrt": F.sqrt,
    "log": F.log10,     # Solr's log() is base 10 (LogFloatFunction)
    "ln": F.log,
    "exp": F.exp,
    "sin": F.sin, "cos": F.cos, "tan": F.tan,
    "asin": F.asin, "acos": F.acos, "atan": F.atan,
    "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
    "ceil": F.ceil, "floor": F.floor, "rint": F.round,
    "min": lambda *c: F.least(*c),
    "max": lambda *c: F.greatest(*c),
    "map": map_val,
    "linear": linear,
    "recip": recip,
    "if": if_fn,
    "exists": exists_fn,
    "def": def_fn,
    "strdist": lambda a, b: F.lit(1.0)
    - F.levenshtein(a, b)
    / F.greatest(F.length(a), F.length(b)),  # edit-distance similarity form
    "ms": F.unix_millis,
}
