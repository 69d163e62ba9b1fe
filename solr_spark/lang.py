"""Reference-name resolution: every function name the reference's
streaming-expression language registers (solrj-streaming
.../solr/client/solrj/io/Lang.java:337-638, the ``withFunctionName``
calls — streams, metrics, operations, the evaluator library, and the
temporal evaluators registered via TemporalEvaluator*.FUNCTION_NAME
constants) mapped
to this engine's implementation, so a user of the reference can find
each operator under the exact name they use today.

``registry()`` returns {name -> implementation}. An implementation is
  * a callable (function, adapter, or class), or
  * a dict of callables for the reference's *distribution objects*
    (constructed by name, then consumed by ``probability`` /
    ``cumulativeProbability`` / ``density`` / ``sample`` — the same
    protocol, with the dict as the model object).

``EXCLUDED`` lists the handful of names that are deliberately not
implemented, each with the reason. ``resolve(name)`` looks a name up or
raises with the exclusion reason. The parity contract is tested by
tests/test_lang_registry.py against the frozen Lang.java name list.

This module only *names* implementations that live elsewhere; nothing
here executes Spark work at import time.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

# names deliberately not implemented -> reason (kept small and honest)
EXCLUDED: dict[str, str] = {
    "plot": "visualization payload formatting (x/y pair echo for UI "
            "charts) — presentation, not computation; out of scope",
    "zplot": "visualization payload formatting — out of scope",
    "eval": "EvalStream re-parses a streaming-expression STRING from a "
            "tuple field; this engine exposes the operator algebra as a "
            "Python API, so there is no string frontend to re-enter. "
            "Every operator the string language names is present under "
            "the same name (this registry).",
    "input": "internal wiring of the parallel() string frontend "
             "(worker-side stream stub), meaningless outside it",
    "priority": "task scheduling hint; scheduling is owned by Spark's "
                "scheduler (FAIR/FIFO pools), not the query algebra",
}


def _sql(spark, query: str):
    """sql()/stream() — Catalyst IS the parallel SQL engine
    (STREAM/SqlStream.java routes to a /sql handler; here the handler
    is spark.sql itself)."""
    return spark.sql(query)


def _calc(spark, col):
    """calc() — evaluate a scalar expression with no input stream
    (Lang.java CalculatorStream): one-row frame, expression folded by
    Catalyst."""
    return spark.range(1).select(col)


def _parallel(df, num_workers: int, *partition_keys):
    """parallel()/executor() — the reference's explicit worker fan-out
    over {!hash} partition keys (STREAM/ParallelStream.java:40-55) is
    Spark's repartition-by-key: same shuffle, declared not hand-built."""
    if partition_keys:
        return df.repartition(num_workers, *partition_keys)
    return df.repartition(num_workers)


def _distinct(df):
    """distinct operation (DistinctOperation) over a sorted stream."""
    return df.distinct()


def _dist_fn(dist: dict, *keys: str):
    for k in keys:
        if k in dist:
            return dist[k]
    raise NotImplementedError(
        f"distribution object supports {sorted(dist)} — none of {keys}"
    )


def probability(dist: dict, *args):
    """probability(dist, x) — ProbabilityEvaluator: pmf for discrete
    models, pdf for continuous ones (the reference's dispatch)."""
    return _dist_fn(dist, "pmf", "pdf")(*args)


def cumulative_probability(dist: dict, *args):
    """cumulativeProbability(dist, x) — CumulativeProbabilityEvaluator."""
    return _dist_fn(dist, "cdf")(*args)


def density(dist: dict, *args):
    """density(dist, x) — DensityEvaluator (continuous pdf)."""
    return _dist_fn(dist, "pdf")(*args)


def sample(dist: dict, *args):
    """sample(dist, ...) — SampleEvaluator. Implemented for the models
    that carry a sampler (normal/uniform via JVM-side rand/randn,
    markovChain/monteCarlo/multivariate-normal in mathx); pdf/cdf-only
    models raise with the supported-key list."""
    return _dist_fn(dist, "sample")(*args)


def _uniform_sample(lo, hi, seed: int = 0):
    return F.lit(lo) + (F.lit(hi) - F.lit(lo)) * F.rand(seed)


def _normal_sample(mu, sigma, seed: int = 0):
    return F.lit(mu) + F.lit(sigma) * F.randn(seed)


def _uniform_pdf(x, lo, hi):
    inside = (x >= lo) & (x <= hi)
    return F.when(inside, F.lit(1.0) / (hi - lo)).otherwise(F.lit(0.0))


def _epoch_millis(col):
    """epoch() — TemporalEvaluatorEpoch.java:40: the UTC instant's
    epoch MILLIseconds (not seconds)."""
    return F.unix_millis(F.col(col).cast("timestamp") if isinstance(col, str) else col.cast("timestamp"))


def _day_of_quarter(col):
    """dayOfQuarter() — IsoFields.DAY_OF_QUARTER
    (TemporalEvaluatorDayOfQuarter.java:39): 1-based day within the
    calendar quarter, via dayofyear minus the quarter-start's dayofyear."""
    c = F.col(col).cast("timestamp") if isinstance(col, str) else col.cast("timestamp")
    return F.dayofyear(c) - F.dayofyear(F.date_trunc("quarter", c)) + F.lit(1)


def _temporal(field: str):
    """Temporal evaluator family (Lang.java:625-638, registered via
    TemporalEvaluator*.FUNCTION_NAME constants): each extracts one
    java.time field from a date value. Spark's builtins match the
    reference's ISO semantics: weekofyear IS
    IsoFields.WEEK_OF_WEEK_BASED_YEAR (TemporalEvaluatorWeek.java:39)
    and quarter IS IsoFields.QUARTER_OF_YEAR."""
    fn = {
        "year": F.year, "month": F.month, "day": F.dayofmonth,
        "dayOfYear": F.dayofyear, "hour": F.hour, "minute": F.minute,
        "second": F.second, "week": F.weekofyear, "quarter": F.quarter,
    }[field]

    def extract(col):
        c = F.col(col) if isinstance(col, str) else col
        return fn(c.cast("timestamp"))

    extract.__name__ = field
    extract.__doc__ = f"{field}() temporal evaluator (TemporalEvaluator{field[0].upper()}{field[1:]})"
    return extract


def distance(measure_or_a, a=None, b=None):
    """distance() — DistanceEvaluator: euclidean by default, or a named
    measure (manhattan/canberra/earthMovers/cosine) as the first arg,
    dispatched to the vector-evaluator library."""
    from .functions import evaluators as ev

    if isinstance(measure_or_a, str):
        return ev.VECTOR[measure_or_a](a, b)
    return ev.VECTOR["euclidean"](measure_or_a, a)


def registry() -> dict[str, Any]:
    """Build the full name -> implementation map (lazy imports keep
    module import cheap and cycle-free)."""
    from . import engine, lets, streaming
    from .functions import classify, evaluators as ev, ltr, mathx
    from .functions import similarity as sim
    from .functions import dedup  # noqa: F401  (minhash lives in qparser surface)
    from .operators import (
        graph,
        joins,
        relational,
        rollup,
        updates,
        windowed,  # noqa: F401  (rerank/top reached via relational/windowed gates)
    )
    from . import sources

    r: dict[str, Any] = {}

    # ---- streams (Lang.java:337-396) ----------------------------------
    r.update({
        "search": relational.search,
        "facet": rollup.facet,
        "facet2D": rollup.facet2d,
        "update": sources.write_commit,
        "delete": updates.delete_by_key,
        "jdbc": sources.read_jdbc,
        "topic": sources.topic_read,
        "commit": sources.write_commit,
        "random": relational.sample,
        "knn": graph.more_like_this_terms,  # KnnStream = MLT neighbours
        "merge": relational.merge_sorted,
        "unique": relational.unique,
        "top": relational.top,
        "group": rollup.reduce_groups,
        "reduce": rollup.reduce_groups,
        "parallel": _parallel,
        "rollup": rollup.rollup,
        "hashRollup": rollup.rollup,
        "stats": rollup.stats,
        "innerJoin": joins.inner_join,
        "leftOuterJoin": joins.left_outer_join,
        "hashJoin": joins.hash_join,
        "outerHashJoin": joins.hash_join,
        "intersect": joins.intersect,
        "complement": joins.complement,
        "sort": relational.export_sorted,
        "train": classify.train_logreg,
        "features": rollup.igain_terms,
        "daemon": streaming.daemon_run,
        "shortestPath": graph.shortest_path_frontier,
        "gatherNodes": graph.graph_expand,
        "nodes": graph.graph_expand,
        "select": relational.select,
        "significantTerms": rollup.relatedness,
        "cartesianProduct": joins.cartesian_product,
        "shuffle": relational.export_sorted,
        "export": relational.export_sorted,
        "calc": _calc,
        "sql": _sql,
        "stream": _sql,
        "classify": classify.classify,
        "fetch": joins.fetch,
        "executor": _parallel,
        "null": ev.SCALAR["null"],
        "echo": lets.LetContext.echo,
        "cell": ev.cell,
        "list": lets.list_streams,
        "let": lets.run_let,
        "get": lets.LetContext.get,
        "timeseries": rollup.timeseries,
        "tuple": lets.LetContext.tuple,
        "plist": lets.plist,
        "hist": mathx.hist_col,
        "drill": rollup.rollup,  # partial+final agg IS Spark's agg plan
        "having": relational.having,
        "model": ltr.from_model_json,  # ModelStream: stored-model fetch
    })

    # ---- metrics (Lang.java:399-406) ----------------------------------
    r.update({
        "min": rollup.AGG_FUNCS["min"],
        "max": rollup.AGG_FUNCS["max"],
        "avg": rollup.AGG_FUNCS["avg"],
        "sum": rollup.AGG_FUNCS["sum"],
        "count": rollup.AGG_FUNCS["count"],
        "countDist": ev.VECTOR["countDist"],
        "std": ev.VECTOR["std"],
        "per": ev.VECTOR["per"],
    })

    # ---- operations + string/scalar/vector/matrix evaluator library ---
    for d in (ev.SCALAR, ev.STRING, ev.VECTOR, ev.MATRIX):
        for name, fn in d.items():
            r.setdefault(name, fn)
    r.update({
        "log": ev.SCALAR["ln"],  # Lang's log() is natural log
        "asc": ev.VECTOR["arraySort"],  # AscEvaluator sorts ascending
        "distinct": _distinct,
        "distance": distance,
        "replace": ev.STRING["replace"],
        "standardize": ev.VECTOR["zscores"],
    })

    # ---- statistics / ML / math evaluators ----------------------------
    r.update({
        "anova": ev.anova_f,
        "ttest": ev.welch_ttest,
        "pairedTtest": ev.paired_ttest,
        "mannWhitney": ev.mann_whitney_u,
        "kolmogorovSmirnov": ev.ks_2sample,
        "ks": ev.ks_2sample,
        "chiSquareDataSet": ev.chi_square_dataset,
        "gtestDataSet": ev.gtest_dataset,
        "corr": ev.corr_expr,
        "cov": ev.covariance,
        "regress": ev.regress_exprs,
        "olsRegress": mathx.ols_regress,
        "knnRegress": mathx.knn_regress,
        "knnSearch": mathx.knn_search,
        "corrPValues": mathx.corr_pvalues,
        "describe": ev.describe,
        "outliers": ev.outliers,
        "diff": ev.diff_lag,
        "movingAvg": ev.moving_avg,
        "movingMedian": ev.moving_median,
        "movingMAD": ev.moving_mad,
        "expMovingAvg": ev.ema,
        "zscores": ev.VECTOR["zscores"],
        "pairSort": ev.pair_sort,
        "recNum": ev.recnum,
        "freqTable": ev.VECTOR["freqTable"],
        "fft": ev.fft_cols,
        "ifft": ev.ifft_cols,
        "loess": ev.loess_smooth,
        "polyfit": ev.polyfit2,
        "convert": ev.SCALAR["convert"],
        "spline": mathx.spline_predict,
        "akima": mathx.akima_predict,
        "bicubicSpline": mathx.bicubic_predict,
        "harmonicFit": mathx.harmonic_fit,
        "harmfit": mathx.harmonic_fit,
        "gaussfit": mathx.gauss_fit,
        "kmeans": sim.kmeans,
        "multiKmeans": sim.multi_kmeans,
        "fuzzyKmeans": sim.fuzzy_kmeans,
        "getMembershipMatrix": mathx.membership_matrix,
        "getCentroids": sim.get_centroids,
        "getCluster": sim.get_cluster,
        "dbscan": mathx.dbscan,
        "markovChain": mathx.markov_chain_sample,
        "monteCarlo": mathx.monte_carlo,
        "termVectors": classify.term_vectors,
        "featureSelect": mathx.feature_select,
        "topFeatures": mathx.top_features,
        "pivot": mathx.pivot_matrix,
        "scoreNodes": graph.score_nodes,
        "primes": mathx.primes,
        "predict": {
            "ols": mathx.ols_predict,
            "spline": mathx.spline_predict,
            "akima": mathx.akima_predict,
            "bicubic": mathx.bicubic_predict,
        },
        # labeled matrices
        "setRowLabels": mathx.with_labels,
        "setColumnLabels": mathx.with_labels,
        "getRowLabels": mathx.get_row_labels,
        "getColumnLabels": mathx.get_col_labels,
        # 2-D geometry
        "convexHull": mathx.convex_hull,
        "getVertices": mathx.get_vertices,
        "getArea": mathx.get_area,
        "getBoundarySize": mathx.get_boundary_size,
        "getBaryCenter": mathx.get_bary_center,
        "projectToBorder": mathx.project_to_border,
        "enclosingDisk": mathx.enclosing_disk,
        "getCenter": mathx.get_center,
        "getRadius": mathx.get_radius,
        "getSupportPoints": mathx.get_support_points,
        "latlonVectors": mathx.latlon_vectors,
        # curve-fit accessors
        "getAmplitude": mathx.get_amplitude,
        "getAngularFrequency": mathx.get_angular_frequency,
        "getPhase": mathx.get_phase,
        # model-tuple attribute reads
        "getAttribute": lets.get_attribute,
        "getAttributes": lets.get_attributes,
        # let()-scope / object cache (LetContext methods)
        "col": lets.LetContext.col,
        "memset": lets.LetContext.memset,
        "putCache": lets.LetContext.put_cache,
        "getCache": lets.LetContext.get_cache,
        "removeCache": lets.LetContext.remove_cache,
        "listCache": lets.LetContext.list_cache,
    })

    # ---- distribution objects (dict = the model object; consumed by
    # probability/cumulativeProbability/density/sample above) -----------
    r.update({
        "normalDistribution": {
            "pdf": ev.norm_pdf, "cdf": ev.norm_cdf,
            "fit": ev.normal_fit, "sample": _normal_sample,
        },
        "uniformDistribution": {
            "pdf": _uniform_pdf, "cdf": ev.uniform_cdf,
            "sample": _uniform_sample,
        },
        "uniformIntegerDistribution": {"pmf": ev.uniform_int_pmf},
        "poissonDistribution": {"pmf": ev.poisson_pmf},
        "binomialDistribution": {"pmf": ev.binomial_pmf},
        "geometricDistribution": {"pmf": ev.geometric_pmf},
        "logNormalDistribution": {
            "pdf": ev.lognormal_pdf, "cdf": ev.lognormal_cdf,
        },
        "weibullDistribution": {
            "pdf": ev.weibull_pdf, "cdf": ev.weibull_cdf,
        },
        "triangularDistribution": {"pdf": ev.triangular_pdf},
        "zipFDistribution": {"pmf": ev.zipf_pmf},
        "gammaDistribution": {"pdf": mathx.gamma_pdf, "cdf": mathx.gamma_cdf},
        "betaDistribution": {"pdf": mathx.beta_pdf, "cdf": mathx.beta_cdf},
        "constantDistribution": {"pdf": ev.constant_pdf, "cdf": ev.constant_cdf},
        "enumeratedDistribution": {"pmf": ev.enumerated_pmf},
        "empiricalDistribution": {"hist": mathx.hist_col},
        # multi-line registration at Lang.java:512-513
        "multiVariateNormalDistribution": {
            "pdf": mathx.mvn_density, "sample": mathx.mvn_sample,
        },
        "probability": probability,
        "cumulativeProbability": cumulative_probability,
        "density": density,
        "sample": sample,
    })

    # ---- temporal evaluators (Lang.java:625-638; names come from
    # TemporalEvaluator*.FUNCTION_NAME constants, not string literals) --
    for name in ("year", "month", "day", "dayOfYear", "hour", "minute",
                 "second", "week", "quarter"):
        r[name] = _temporal(name)
    r["epoch"] = _epoch_millis
    r["dayOfQuarter"] = _day_of_quarter

    # engine-level entries reached through the same names
    r.setdefault("percentile", ev.VECTOR["percentile"])
    assert "search" in r and engine is not None
    return r


def resolve(name: str) -> Any:
    """Look a reference function name up; raise with the exclusion
    reason (or a did-you-mean-less KeyError) when absent."""
    r = registry()
    if name in r:
        return r[name]
    if name in EXCLUDED:
        raise NotImplementedError(f"{name}: {EXCLUDED[name]}")
    raise KeyError(f"unknown reference function name: {name!r}")
