"""Math-expression long tail: regression, significance, samplers,
curve fits, histogram and 2-D computational geometry.

Reference classes (solrj-streaming io/eval):
  OLSRegressionEvaluator.java:1        — olsRegress / predict
  KnnEvaluator.java:1                  — knnSearch
  KnnRegressionEvaluator.java:1        — knnRegress
  CorrelationSignificanceEvaluator.java:1 — corrPValues
  MarkovChainEvaluator.java:1          — markovChain + sample
  MonteCarloEvaluator.java:1           — monteCarlo
  MultiVariateNormalDistributionEvaluator.java:1 / DensityEvaluator.java:1
  HistogramEvaluator.java:1            — hist (EmpiricalDistribution bins)
  HarmonicFitEvaluator.java:1 GaussFitEvaluator.java:1
  GetAmplitudeEvaluator / GetAngularFrequencyEvaluator / GetPhaseEvaluator
  ConvexHullEvaluator.java:1 GetVerticesEvaluator GetAreaEvaluator
  GetBoundarySizeEvaluator GetBaryCenterEvaluator ProjectToBorderEvaluator
  EnclosingDiskEvaluator.java:1 GetCenterEvaluator GetRadiusEvaluator
  GetSupportPointsEvaluator LatLonVectorsEvaluator
  TopFeaturesEvaluator.java:1 PivotEvaluator.java:1
  GetMembershipMatrixEvaluator.java:1

The reference evaluates these driver-side over in-memory lists/matrices
(Commons Math).  Here the heavy inputs stay DataFrames: OLS reduces the
Gram matrix with ONE partial-aggregated pass (no data shuffle — only
p(p+1)/2+p scalars cross the wire, so the same plan holds at 100 TB);
knn search/regress reuse the broadcast-query brute kernel from
similarity.py; per-document geometry/fits run as Arrow-batched pandas
UDFs over array columns (one hull per row, embarrassingly parallel).
Samplers are explicitly seeded — determinism is part of the contract.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# --------------------------------------------------------------------------
# regularized incomplete beta (Lentz continued fraction) — public-domain
# numerical recipe; needed for Student-t CDF → correlation p-values.


def _betacf(a: float, b: float, x: float) -> float:
    MAXIT, EPS, FPMIN = 200, 3e-12, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_sf(t: float, df: float) -> float:
    """Two-sided Student-t survival p-value P(|T| >= t)."""
    return betainc(df / 2.0, 0.5, df / (df + t * t))


def corr_pvalues(corr: list[list[float]] | np.ndarray, n: int) -> list[list[float]]:
    """CorrelationSignificanceEvaluator: two-sided p-value for each
    pairwise correlation in the matrix, sample size n (diagonal → 0)."""
    c = np.asarray(corr, dtype=float)
    out = np.zeros_like(c)
    df = n - 2
    for i in range(c.shape[0]):
        for j in range(c.shape[1]):
            if i == j:
                continue
            r = min(max(c[i, j], -0.999999999999), 0.999999999999)
            t = abs(r) * math.sqrt(df / (1.0 - r * r))
            out[i, j] = t_sf(t, df)
    return out.tolist()


# --------------------------------------------------------------------------
# OLS multiple regression — ONE distributed pass builds the Gram matrix
# (partial aggregation per partition; only scalars shuffle), the p×p
# solve happens on the driver.  Matches OLSRegressionEvaluator's
# OLSMultipleLinearRegression outputs (intercept first).


def ols_regress(
    df: DataFrame, x_cols: list[str], y_col: str
) -> dict[str, object]:
    p = len(x_cols)
    terms = [F.lit(1.0)] + [F.col(c).cast("double") for c in x_cols]
    y = F.col(y_col).cast("double")
    aggs = [F.count(F.lit(1)).alias("n"), F.sum(y).alias("sy"),
            F.sum(y * y).alias("syy")]
    for i in range(p + 1):
        for j in range(i, p + 1):
            aggs.append(F.sum(terms[i] * terms[j]).alias(f"g_{i}_{j}"))
        aggs.append(F.sum(terms[i] * y).alias(f"xy_{i}"))
    row = df.agg(*aggs).collect()[0]
    n = row["n"]
    G = np.zeros((p + 1, p + 1))
    for i in range(p + 1):
        for j in range(i, p + 1):
            G[i, j] = G[j, i] = row[f"g_{i}_{j}"]
    Xy = np.array([row[f"xy_{i}"] for i in range(p + 1)])
    beta = np.linalg.solve(G, Xy)
    syy, sy = row["syy"], row["sy"]
    sst = syy - sy * sy / n
    # residual SS via the normal equations: SSE = y'y - beta' X'y
    sse = syy - float(beta @ Xy)
    r2 = 1.0 - sse / sst if sst > 0 else float("nan")
    adj = 1.0 - (sse / (n - p - 1)) / (sst / (n - 1)) if n > p + 1 else r2
    # parameter covariance = sigma² (X'X)^-1
    sigma2 = sse / (n - p - 1) if n > p + 1 else float("nan")
    try:
        Ginv = np.linalg.inv(G)
        se = np.sqrt(np.maximum(np.diag(Ginv) * sigma2, 0.0)).tolist()
    except np.linalg.LinAlgError:
        se = None
    return {
        "regressionParameters": beta.tolist(),
        "RSquared": r2,
        "adjustedRSquared": adj,
        "residualSumSquares": sse,
        "regressandVariance": sst / (n - 1),
        "regressionParametersStandardErrors": se,
        "n": int(n),
    }


def ols_predict(df: DataFrame, params: list[float], x_cols: list[str],
                out_col: str = "prediction") -> DataFrame:
    """PredictEvaluator over an olsRegress model: intercept + Σ beta_i x_i,
    folded into a single Catalyst expression."""
    expr = F.lit(float(params[0]))
    for b, c in zip(params[1:], x_cols):
        expr = expr + F.lit(float(b)) * F.col(c).cast("double")
    return df.withColumn(out_col, expr)


# --------------------------------------------------------------------------
# knnSearch / knnRegress — broadcast the query point, score corpus-side.


def _dist_expr(vec_col: str, q: list[float], measure: str) -> Column:
    qa = F.array(*[F.lit(float(v)) for v in q])
    a = F.col(vec_col)
    if measure == "euclidean":
        return F.sqrt(F.aggregate(
            F.zip_with(a, qa, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, v: acc + v))
    if measure == "manhattan":
        return F.aggregate(F.zip_with(a, qa, lambda x, y: F.abs(x - y)),
                           F.lit(0.0), lambda acc, v: acc + v)
    if measure == "cosine":
        dot = F.aggregate(F.zip_with(a, qa, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, v: acc + v)
        na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                                F.lit(0.0), lambda acc, v: acc + v))
        nq = float(np.sqrt(np.dot(q, q)))
        return F.lit(1.0) - dot / (na * F.lit(nq))
    raise ValueError(f"unknown distance measure {measure!r}")


def knn_search(
    corpus: DataFrame,
    query_vec: list[float],
    k: int,
    vec_col: str = "embedding",
    measure: str = "euclidean",
) -> DataFrame:
    """KnnEvaluator: the k corpus rows nearest to one query vector.
    The query broadcasts inside the plan as literals; the scan is a
    single map + TakeOrdered(k) — no shuffle of the corpus."""
    return (
        corpus.withColumn("__dist", _dist_expr(vec_col, query_vec, measure))
        .orderBy(F.asc("__dist"), *[F.asc(c) for c in corpus.columns
                                    if c != vec_col][:1])
        .limit(k)
    )


def knn_regress(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    y_col: str,
    corpus_vec: str = "embedding",
    query_vec: str = "embedding",
    query_id: str = "query_id",
    measure: str = "euclidean",
    robust: bool = False,
    round_to: int | None = None,
) -> DataFrame:
    """KnnRegressionEvaluator: predict y(query) as the mean (median when
    robust, matching the reference's robust flag) of the k nearest
    neighbors' outcomes.  Broadcast the (small) query batch against the
    corpus, rank per query, aggregate — corpus never shuffles."""
    from pyspark.sql import Window

    q = queries.select(F.col(query_id), F.col(query_vec).alias("__q"))
    a, b = F.col(corpus_vec), F.col("__q")
    if measure == "euclidean":
        d = F.sqrt(F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                               F.lit(0.0), lambda acc, v: acc + v))
    elif measure == "manhattan":
        d = F.aggregate(F.zip_with(a, b, lambda x, y: F.abs(x - y)),
                        F.lit(0.0), lambda acc, v: acc + v)
    else:
        raise ValueError(f"unknown distance measure {measure!r}")
    if round_to is not None:
        # rounded ranking key: kills cross-engine fp ranking wobble when
        # an oracle mirrors this query (same pattern as brute_force_topk)
        d = F.round(d, round_to)
    scored = corpus.crossJoin(F.broadcast(q)).select(
        query_id, F.col(y_col).cast("double").alias("__y"), d.alias("__d")
    )
    w = Window.partitionBy(query_id).orderBy(F.asc("__d"), F.asc("__y"))
    top = scored.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    agg = (F.percentile_approx("__y", 0.5, 10000) if robust
           else F.avg("__y"))
    return top.groupBy(query_id).agg(agg.alias("prediction"))


# --------------------------------------------------------------------------
# seeded samplers (markovChain / monteCarlo / multiVariateNormal).  The
# reference seeds from java.util.Random(); here the seed is explicit so
# results are reproducible across runs and cluster sizes.


def markov_chain_sample(
    transition: list[list[float]], n: int, state: int = 0, seed: int = 0
) -> list[int]:
    """MarkovChainEvaluator + sample(chain, n): walk the (square,
    row-stochastic) transition matrix n steps from `state`."""
    P = np.asarray(transition, dtype=float)
    if P.shape[0] != P.shape[1]:
        raise ValueError("markovChain must be initialized with a square matrix")
    rng = np.random.default_rng(seed)
    out, s = [], state
    for _ in range(n):
        s = int(rng.choice(P.shape[0], p=P[s] / P[s].sum()))
        out.append(s)
    return out


def monte_carlo(fn, samplers: list, n: int, seed: int = 0) -> list[float]:
    """MonteCarloEvaluator: n evaluations of fn(*draws) where each draw
    comes from the matching sampler callable(rng) -> float."""
    rng = np.random.default_rng(seed)
    return [float(fn(*[s(rng) for s in samplers])) for _ in range(n)]


def mvn_sample(means: list[float], cov: list[list[float]], n: int,
               seed: int = 0) -> list[list[float]]:
    """multiVariateNormalDistribution + sample."""
    rng = np.random.default_rng(seed)
    return rng.multivariate_normal(
        np.asarray(means, float), np.asarray(cov, float), size=n
    ).tolist()


def mvn_density(means: list[float], cov: list[list[float]],
                x: list[float]) -> float:
    """DensityEvaluator over a multiVariateNormalDistribution."""
    mu = np.asarray(means, float)
    S = np.asarray(cov, float)
    d = np.asarray(x, float) - mu
    k = len(mu)
    det = np.linalg.det(S)
    inv = np.linalg.inv(S)
    return float(
        math.exp(-0.5 * float(d @ inv @ d))
        / math.sqrt(((2 * math.pi) ** k) * det)
    )


# --------------------------------------------------------------------------
# hist — EmpiricalDistribution-style equal-width bins; per-row over an
# array column (Arrow-batched).  cumProb is the discrete empirical CDF
# at the bin mean (the reference interpolates with within-bin normal
# kernels; documented stand-in).

_HIST_SCHEMA = (
    "array<struct<N:bigint,min:double,max:double,mean:double,var:double,"
    "stdev:double,sum:double,prob:double,cumProb:double>>"
)


def hist_col(arr: Column, bins: int = 10) -> Column:
    @pandas_udf(_HIST_SCHEMA)
    def _hist(vals: pd.Series) -> pd.Series:
        out = []
        for v in vals:
            a = np.asarray(v, dtype=float)
            lo, hi = a.min(), a.max()
            edges = np.linspace(lo, hi, bins + 1)
            idx = np.clip(np.searchsorted(edges, a, side="right") - 1, 0,
                          bins - 1)
            rows, cum = [], 0
            for b in range(bins):
                x = a[idx == b]
                nb = int(x.size)
                cum += nb
                rows.append(
                    {
                        "N": nb,
                        "min": float(x.min()) if nb else float("nan"),
                        "max": float(x.max()) if nb else float("nan"),
                        "mean": float(x.mean()) if nb else float("nan"),
                        "var": float(x.var(ddof=1)) if nb > 1 else 0.0,
                        "stdev": float(x.std(ddof=1)) if nb > 1 else 0.0,
                        "sum": float(x.sum()) if nb else 0.0,
                        "prob": nb / a.size,
                        "cumProb": (cum - nb / 2.0) / a.size,
                    }
                )
            out.append(rows)
        return pd.Series(out)

    return _hist(arr)


# --------------------------------------------------------------------------
# curve fits — harmonicFit / gaussFit, numpy Gauss-Newton with an
# FFT-based (harmonic) / moment-based (gauss) initial guess.  Return a
# struct carrying the fitted curve plus the parameters so the
# getAmplitude/getAngularFrequency/getPhase accessors are plain
# getField()s.

_HARM_SCHEMA = (
    "struct<fitted:array<double>,amplitude:double,"
    "angularFrequency:double,phase:double>"
)


def _harm_sse(om: float, x: np.ndarray, yc: np.ndarray):
    """For fixed omega the model a·sin(ωx+φ) = A sin(ωx) + B cos(ωx) is
    linear — profile out (A, B) and return the SSE."""
    S, C = np.sin(om * x), np.cos(om * x)
    M = np.column_stack([S, C])
    (A, B), *_ = np.linalg.lstsq(M, yc, rcond=None)
    r = yc - (A * S + B * C)
    return float(r @ r), A, B


def _harm_fit_one(x: np.ndarray, y: np.ndarray):
    # initial omega from the dominant FFT frequency (uniform x assumed
    # for the guess only), then a grid + golden-section refinement of
    # the profiled SSE over one FFT bin on either side
    # NOTE: the model a*sin(om x + phi) has no offset term
    # (HarmonicOscillator), so the least-squares runs on raw y; only the
    # FFT guess uses the centered series.
    n = len(x)
    yc = y - y.mean()
    d = (x[-1] - x[0]) / max(n - 1, 1)
    freqs = np.fft.rfftfreq(n, d=d)
    mag = np.abs(np.fft.rfft(yc))
    mag[0] = 0.0
    om0 = 2 * math.pi * freqs[int(np.argmax(mag))]
    yc = y  # fit the un-centered series from here on
    binw = 2 * math.pi / (n * d)
    lo, hi = max(om0 - binw, 1e-9), om0 + binw
    grid = np.linspace(lo, hi, 64)
    sses = [_harm_sse(om, x, yc)[0] for om in grid]
    i = int(np.argmin(sses))
    a_om = grid[max(i - 1, 0)]
    b_om = grid[min(i + 1, len(grid) - 1)]
    gr = (math.sqrt(5) - 1) / 2
    c_om = b_om - gr * (b_om - a_om)
    d_om = a_om + gr * (b_om - a_om)
    fc, fd = _harm_sse(c_om, x, yc)[0], _harm_sse(d_om, x, yc)[0]
    for _ in range(60):
        if fc < fd:
            b_om, d_om, fd = d_om, c_om, fc
            c_om = b_om - gr * (b_om - a_om)
            fc = _harm_sse(c_om, x, yc)[0]
        else:
            a_om, c_om, fc = c_om, d_om, fd
            d_om = a_om + gr * (b_om - a_om)
            fd = _harm_sse(d_om, x, yc)[0]
        if b_om - a_om < 1e-12:
            break
    om = (a_om + b_om) / 2.0
    _, A, B = _harm_sse(om, x, yc)
    amp = math.hypot(A, B)
    phase = math.atan2(B, A)
    fitted = (amp * np.sin(om * x + phase)).tolist()
    return fitted, amp, om, phase


def harmonic_fit(df: DataFrame, x_col: str, y_col: str,
                 out_col: str = "harmfit") -> DataFrame:
    @pandas_udf(_HARM_SCHEMA)
    def _fit(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        rows = []
        for xv, yv in zip(xs, ys):
            f, a, o, p = _harm_fit_one(np.asarray(xv, float),
                                       np.asarray(yv, float))
            rows.append({"fitted": f, "amplitude": a,
                         "angularFrequency": o, "phase": p})
        return pd.DataFrame(rows)

    return df.withColumn(out_col, _fit(F.col(x_col), F.col(y_col)))


_GAUSS_SCHEMA = (
    "struct<fitted:array<double>,a:double,b:double,c:double>"
)


def gauss_fit(df: DataFrame, x_col: str, y_col: str,
              out_col: str = "gaussfit") -> DataFrame:
    """GaussFitEvaluator: fit y = a·exp(−(x−b)²/(2c²)).  Moment guess +
    damped Gauss-Newton; per-row Arrow batches."""

    @pandas_udf(_GAUSS_SCHEMA)
    def _fit(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        rows = []
        for xv, yv in zip(xs, ys):
            x = np.asarray(xv, float)
            y = np.asarray(yv, float)
            w = np.clip(y - y.min(), 0, None) + 1e-12
            b = float((x * w).sum() / w.sum())
            c = math.sqrt(float((w * (x - b) ** 2).sum() / w.sum())) or 1.0
            a = float(y.max())
            for _ in range(60):
                e = np.exp(-((x - b) ** 2) / (2 * c * c))
                r = y - a * e
                J = np.column_stack([
                    e,
                    a * e * (x - b) / (c * c),
                    a * e * ((x - b) ** 2) / (c ** 3),
                ])
                JTJ = J.T @ J + 1e-9 * np.eye(3)
                try:
                    step = np.linalg.solve(JTJ, J.T @ r)
                except np.linalg.LinAlgError:
                    break
                a, b, c = a + step[0], b + step[1], c + step[2]
                if float(np.abs(step).max()) < 1e-12:
                    break
            fitted = (a * np.exp(-((x - b) ** 2) / (2 * c * c))).tolist()
            rows.append({"fitted": fitted, "a": a, "b": b, "c": abs(c)})
        return pd.DataFrame(rows)

    return df.withColumn(out_col, _fit(F.col(x_col), F.col(y_col)))


# accessors (GetAmplitude/GetAngularFrequency/GetPhase over the structs)
def get_amplitude(c: Column) -> Column:
    return c.getField("amplitude")


def get_angular_frequency(c: Column) -> Column:
    return c.getField("angularFrequency")


def get_phase(c: Column) -> Column:
    return c.getField("phase")


# --------------------------------------------------------------------------
# 2-D computational geometry — per-row over array<array<double>> point
# sets.  Monotone-chain hull and Welzl's minimal enclosing disk are the
# textbook algorithms (the reference delegates to Commons Math geometry).

_HULL_SCHEMA = (
    "struct<vertices:array<array<double>>,area:double,"
    "boundarySize:double,baryCenter:array<double>>"
)


def _hull_one(pts: np.ndarray):
    P = np.unique(pts, axis=0)
    P = P[np.lexsort((P[:, 1], P[:, 0]))]
    if len(P) <= 2:
        verts = P.tolist()
        per = 2 * float(np.linalg.norm(P[-1] - P[0])) if len(P) == 2 else 0.0
        return verts, 0.0, per, P.mean(axis=0).tolist()

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower, upper = [], []
    for p in P:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    for p in P[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = np.array(lower[:-1] + upper[:-1])
    x, y = hull[:, 0], hull[:, 1]
    area = 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))
    per = float(np.linalg.norm(np.roll(hull, -1, axis=0) - hull, axis=1).sum())
    return hull.tolist(), area, per, hull.mean(axis=0).tolist()


def convex_hull(points: Column) -> Column:
    @pandas_udf(_HULL_SCHEMA)
    def _hull(ps: pd.Series) -> pd.DataFrame:
        rows = []
        for p in ps:
            pts = np.array([np.asarray(r, dtype=float) for r in p])
            v, a, per, bc = _hull_one(pts)
            rows.append({"vertices": v, "area": a, "boundarySize": per,
                         "baryCenter": bc})
        return pd.DataFrame(rows)

    return _hull(points)


def get_vertices(c: Column) -> Column:
    return c.getField("vertices")


def get_area(c: Column) -> Column:
    return c.getField("area")


def get_boundary_size(c: Column) -> Column:
    return c.getField("boundarySize")


def get_bary_center(c: Column) -> Column:
    return c.getField("baryCenter")


def project_to_border(hull_vertices: Column, point: Column) -> Column:
    """ProjectToBorderEvaluator: the closest point on the hull boundary
    (segment-wise orthogonal projection, clamped to segment ends)."""

    @pandas_udf("array<double>")
    def _proj(vs: pd.Series, ps: pd.Series) -> pd.Series:
        out = []
        for v, p in zip(vs, ps):
            V = np.array([np.asarray(r, dtype=float) for r in v])
            q = np.asarray(p, float)
            best, bd = None, float("inf")
            for i in range(len(V)):
                a, b = V[i], V[(i + 1) % len(V)]
                ab = b - a
                t = 0.0 if not ab.any() else float(
                    np.clip(np.dot(q - a, ab) / np.dot(ab, ab), 0.0, 1.0))
                proj = a + t * ab
                d = float(np.linalg.norm(q - proj))
                if d < bd:
                    bd, best = d, proj
            out.append(best.tolist())
        return pd.Series(out)

    return _proj(hull_vertices, point)


_DISK_SCHEMA = (
    "struct<center:array<double>,radius:double,"
    "supportPoints:array<array<double>>>"
)


def _disk_two(a, b):
    c = (a + b) / 2.0
    return c, float(np.linalg.norm(a - c)), [a, b]


def _disk_three(a, b, c):
    ax, ay = a
    bx, by = b
    cx, cy = c
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if abs(d) < 1e-18:
        return None
    ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay)
          + (cx**2 + cy**2) * (ay - by)) / d
    uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx)
          + (cx**2 + cy**2) * (bx - ax)) / d
    ctr = np.array([ux, uy])
    return ctr, float(np.linalg.norm(a - ctr)), [a, b, c]


def _welzl(pts: np.ndarray):
    # deterministic (input-order) Welzl, iterative move-to-front
    EPS = 1e-9
    ctr, r, sup = pts[0].copy(), 0.0, [pts[0]]
    for i in range(1, len(pts)):
        if np.linalg.norm(pts[i] - ctr) <= r + EPS:
            continue
        ctr, r, sup = pts[i].copy(), 0.0, [pts[i]]
        for j in range(i):
            if np.linalg.norm(pts[j] - ctr) <= r + EPS:
                continue
            ctr, r, sup = _disk_two(pts[i], pts[j])
            for k2 in range(j):
                if np.linalg.norm(pts[k2] - ctr) <= r + EPS:
                    continue
                got = _disk_three(pts[i], pts[j], pts[k2])
                if got is not None:
                    ctr, r, sup = got
    return ctr.tolist(), r, [s.tolist() for s in sup]


def enclosing_disk(points: Column) -> Column:
    @pandas_udf(_DISK_SCHEMA)
    def _disk(ps: pd.Series) -> pd.DataFrame:
        rows = []
        for p in ps:
            pts = np.array([np.asarray(r, dtype=float) for r in p])
            c, r, sup = _welzl(pts)
            rows.append({"center": c, "radius": r, "supportPoints": sup})
        return pd.DataFrame(rows)

    return _disk(points)


def get_center(c: Column) -> Column:
    return c.getField("center")


def get_radius(c: Column) -> Column:
    return c.getField("radius")


def get_support_points(c: Column) -> Column:
    return c.getField("supportPoints")


def latlon_vectors(lat: Column, lon: Column) -> Column:
    """LatLonVectorsEvaluator: zip parallel lat/lon arrays into a 2-column
    matrix (array of [lat, lon] rows)."""
    return F.zip_with(lat, lon, lambda a, b: F.array(a, b))


# --------------------------------------------------------------------------
# labeled matrices + topFeatures + pivot + membership matrix


def with_labels(data: Column, row_labels: Column | None = None,
                col_labels: Column | None = None) -> Column:
    """setRowLabels/setColumnLabels: a labeled matrix is a struct of
    (data, rowLabels, colLabels) — labels ride the value, no shuffle."""
    return F.struct(
        data.alias("data"),
        (row_labels if row_labels is not None
         else F.lit(None).cast("array<string>")).alias("rowLabels"),
        (col_labels if col_labels is not None
         else F.lit(None).cast("array<string>")).alias("colLabels"),
    )


def get_row_labels(m: Column) -> Column:
    return m.getField("rowLabels")


def get_col_labels(m: Column) -> Column:
    return m.getField("colLabels")


def top_features(m: Column, k: int) -> Column:
    """TopFeaturesEvaluator: per matrix row, the column labels of the k
    largest strictly-positive entries, descending."""

    @pandas_udf("array<array<string>>")
    def _top(ms: pd.DataFrame) -> pd.Series:
        # struct-typed input arrives as a pandas DataFrame of fields
        out = []
        for _, rec in ms.iterrows():
            data = np.array([np.asarray(r, dtype=float) for r in rec["data"]])
            labels = list(rec["colLabels"])
            rows = []
            for r in data:
                idx = [i for i in np.argsort(-r, kind="stable")
                       if r[i] > 0][:k]
                rows.append([labels[i] for i in idx])
            out.append(rows)
        return pd.Series(out)

    return _top(m)


def pivot_matrix(df: DataFrame, x: str, y: str, value: str) -> DataFrame:
    """PivotEvaluator: tuples → labeled matrix frame (one row per x,
    one column per y, first(value) in the cell, 0.0 where absent)."""
    return (
        df.groupBy(x).pivot(y).agg(F.first(F.col(value).cast("double")))
        .na.fill(0.0)
        .orderBy(x)
    )


def membership_matrix(memberships: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """GetMembershipMatrixEvaluator over fuzzy_kmeans output
    (id, cluster_id, membership): one row per id, membership vector
    ordered by cluster_id."""
    return (
        memberships.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("cluster_id", "membership"))),
                lambda s: s.getField("membership"),
            ).alias("memberships")
        )
        .orderBy(id_col)
    )


# --------------------------------------------------------------------------
# regularized incomplete gamma — series for x < a+1, Lentz continued
# fraction otherwise (the classic pair of public-domain algorithms; same
# Lentz scheme as _betacf above).  Needed for gamma/chi-square CDFs.


def _gamma_series(a: float, x: float) -> float:
    ap, summ = a, 1.0 / a
    delta = summ
    for _ in range(500):
        ap += 1.0
        delta *= x / ap
        summ += delta
        if abs(delta) < abs(summ) * 3e-12:
            break
    return summ * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gamma_cf(a: float, x: float) -> float:
    FPMIN = 1e-300
    b = x + 1.0 - a
    c = 1.0 / FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < FPMIN:
            d = FPMIN
        c = b + an / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 3e-12:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def gammainc_lower_reg(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x)."""
    if x <= 0.0:
        return 0.0
    if x < a + 1.0:
        return _gamma_series(a, x)
    return 1.0 - _gamma_cf(a, x)


def gamma_cdf_value(x: float, shape: float, scale: float) -> float:
    """Gamma(shape, scale) CDF (GammaDistributionEvaluator's
    cumulativeProbability; Commons Math GammaDistribution)."""
    if x <= 0.0:
        return 0.0
    return gammainc_lower_reg(shape, x / scale)


def chi2_sf(x: float, k: float) -> float:
    """Chi-square survival P(X >= x) with k degrees of freedom."""
    return 1.0 - gammainc_lower_reg(k / 2.0, x / 2.0)


def beta_cdf_value(x: float, a: float, b: float) -> float:
    """Beta(a, b) CDF (BetaDistributionEvaluator)."""
    return betainc(a, b, min(max(x, 0.0), 1.0))


def gamma_cdf(x: Column, shape: float, scale: float) -> Column:
    """Arrow-batched gamma CDF column (no Catalyst incomplete gamma)."""

    @pandas_udf("double")
    def _f(s: pd.Series) -> pd.Series:
        return s.astype(float).map(lambda v: gamma_cdf_value(v, shape, scale))

    return _f(x)


def beta_cdf(x: Column, a: float, b: float) -> Column:
    @pandas_udf("double")
    def _f(s: pd.Series) -> pd.Series:
        return s.astype(float).map(lambda v: beta_cdf_value(v, a, b))

    return _f(x)


def gamma_pdf(x: Column, shape: float, scale: float) -> Column:
    """Gamma pdf as a pure Catalyst closed form — Γ(shape) folds to a
    driver constant, so the hot path stays in whole-stage codegen."""
    lg = math.lgamma(shape)
    xx = x.cast("double")
    return F.when(xx <= 0.0, F.lit(0.0)).otherwise(
        F.exp(
            (shape - 1.0) * F.log(xx)
            - xx / scale
            - F.lit(lg + shape * math.log(scale))
        )
    )


def beta_pdf(x: Column, a: float, b: float) -> Column:
    lb = math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)
    xx = x.cast("double")
    return F.when((xx <= 0.0) | (xx >= 1.0), F.lit(0.0)).otherwise(
        F.exp((a - 1.0) * F.log(xx) + (b - 1.0) * F.log(F.lit(1.0) - xx) - lb)
    )


# --------------------------------------------------------------------------
# DBSCAN over an in-tuple point set (DbscanEvaluator — the reference
# clusters a matrix held in one stream tuple, so the per-row Arrow batch
# mirrors its execution shape; corpus-scale clustering is kmeans's job).


def _dbscan_one(pts: np.ndarray, eps: float, min_pts: int) -> list[int]:
    n = len(pts)
    labels = [-1] * n  # -1 = noise
    if n == 0:
        return labels
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
    neigh = [np.flatnonzero(row <= eps * eps) for row in d2]
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or len(neigh[i]) < min_pts:
            continue
        cluster += 1
        labels[i] = cluster
        stack = list(neigh[i])
        while stack:
            j = stack.pop()
            if labels[j] == -1:
                labels[j] = cluster
                if len(neigh[j]) >= min_pts:
                    stack.extend(int(q) for q in neigh[j] if labels[q] == -1)
    return labels


def dbscan(points: Column, eps: float, min_pts: int) -> Column:
    """Cluster labels (1..k, -1 = noise) for an array<array<double>>
    column of points — deterministic: seeds scan in row order."""

    @pandas_udf("array<int>")
    def _f(s: pd.Series) -> pd.Series:
        out = []
        for pts in s:
            if pts is None or len(pts) == 0:
                out.append([])
                continue
            out.append(_dbscan_one(np.asarray([list(p) for p in pts], float),
                                   eps, min_pts))
        return pd.Series(out)

    return _f(points)


# --------------------------------------------------------------------------
# Akima spline (AkimaEvaluator → Commons Math AkimaSplineInterpolator;
# Akima 1970): slope at each knot is the weighted average of adjacent
# secant slopes, weights = |m_{i+1} − m_i|.  Fitted per row, predicted
# with a cubic Hermite segment — all from the published formulas.


def _akima_slopes(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    n = len(x)
    m = np.diff(y) / np.diff(x)
    # extend secant slopes per Akima's end conditions
    mm = np.empty(n + 3)
    mm[2 : n + 1] = m
    mm[1] = 2.0 * mm[2] - mm[3]
    mm[0] = 2.0 * mm[1] - mm[2]
    mm[n + 1] = 2.0 * mm[n] - mm[n - 1]
    mm[n + 2] = 2.0 * mm[n + 1] - mm[n]
    w1 = np.abs(mm[3:] - mm[2:-1])  # |m_{i+1} - m_i|
    w2 = np.abs(mm[1:-2] - mm[:-3])  # |m_{i-1} - m_{i-2}|
    t = np.empty(n)
    for i in range(n):
        if w1[i] + w2[i] == 0.0:
            t[i] = 0.5 * (mm[i + 1] + mm[i + 2])
        else:
            t[i] = (w1[i] * mm[i + 1] + w2[i] * mm[i + 2]) / (w1[i] + w2[i])
    return t


def akima_predict_values(
    x: list[float], y: list[float], at: list[float]
) -> list[float]:
    """Evaluate the Akima spline through (x, y) at the points ``at``."""
    xa, ya = np.asarray(x, float), np.asarray(y, float)
    order = np.argsort(xa)
    xa, ya = xa[order], ya[order]
    t = _akima_slopes(xa, ya)
    out = []
    for v in at:
        i = int(np.clip(np.searchsorted(xa, v, side="right") - 1, 0, len(xa) - 2))
        h = xa[i + 1] - xa[i]
        s = (v - xa[i]) / h
        h00 = 2 * s**3 - 3 * s**2 + 1
        h10 = s**3 - 2 * s**2 + s
        h01 = -2 * s**3 + 3 * s**2
        h11 = s**3 - s**2
        out.append(
            float(h00 * ya[i] + h10 * h * t[i] + h01 * ya[i + 1] + h11 * h * t[i + 1])
        )
    return out


def akima_predict(x: Column, y: Column, at: Column) -> Column:
    """Per-row Akima interpolation: three array columns → array of
    predictions (the reference evaluates the interpolator inside one
    stream tuple the same way)."""

    @pandas_udf("array<double>")
    def _f(xs: pd.Series, ys: pd.Series, ats: pd.Series) -> pd.Series:
        out = []
        for xv, yv, av in zip(xs, ys, ats):
            if xv is None or yv is None or av is None or len(xv) < 3:
                out.append(None)
                continue
            out.append(akima_predict_values(list(xv), list(yv), list(av)))
        return pd.Series(out)

    return _f(x, y, at)


# --------------------------------------------------------------------------
# primes (PrimesEvaluator): first n primes >= start.


def primes(n: int, start: int = 2) -> list[int]:
    out: list[int] = []
    cand = max(2, int(start))
    while len(out) < n:
        is_p = cand >= 2 and all(cand % p for p in range(2, int(cand**0.5) + 1))
        if is_p:
            out.append(cand)
        cand += 1
    return out


# --------------------------------------------------------------------------
# Natural cubic spline (SplineEvaluator → Commons Math SplineInterpolator).
# The interpolator is the textbook natural cubic spline: second
# derivative zero at both ends, coefficients from the tridiagonal system
# (Burden & Faires, Numerical Analysis, Algorithm 3.4 — public method).
# Reference registration: solrj-streaming io/eval/SplineEvaluator.java:1
# (Lang.java "spline"); like the reference we fit per tuple and predict
# with predict()'s interpolator protocol.


def spline_coeffs(x: np.ndarray, y: np.ndarray):
    """Natural-cubic-spline coefficients (b, c, d) per segment so that
    S_i(v) = y_i + b_i*h + c_i*h^2 + d_i*h^3 with h = v - x_i."""
    n = len(x) - 1
    h = np.diff(x)
    alpha = np.zeros(n + 1)
    alpha[1:n] = 3.0 * (y[2:] - y[1:-1]) / h[1:] - 3.0 * (y[1:-1] - y[:-2]) / h[:-1]
    el = np.ones(n + 1)
    mu = np.zeros(n + 1)
    z = np.zeros(n + 1)
    for i in range(1, n):
        el[i] = 2.0 * (x[i + 1] - x[i - 1]) - h[i - 1] * mu[i - 1]
        mu[i] = h[i] / el[i]
        z[i] = (alpha[i] - h[i - 1] * z[i - 1]) / el[i]
    c = np.zeros(n + 1)
    b = np.zeros(n)
    d = np.zeros(n)
    for j in range(n - 1, -1, -1):
        c[j] = z[j] - mu[j] * c[j + 1]
        b[j] = (y[j + 1] - y[j]) / h[j] - h[j] * (c[j + 1] + 2.0 * c[j]) / 3.0
        d[j] = (c[j + 1] - c[j]) / (3.0 * h[j])
    return b, c[:-1], d


def spline_predict_values(
    x: list[float], y: list[float], at: list[float]
) -> list[float]:
    """Evaluate the natural cubic spline through (x, y) at ``at``."""
    xa, ya = np.asarray(x, float), np.asarray(y, float)
    order = np.argsort(xa)
    xa, ya = xa[order], ya[order]
    b, c, d = spline_coeffs(xa, ya)
    out = []
    for v in at:
        i = int(np.clip(np.searchsorted(xa, v, side="right") - 1, 0, len(xa) - 2))
        h = v - xa[i]
        out.append(float(ya[i] + b[i] * h + c[i] * h * h + d[i] * h * h * h))
    return out


def spline_predict(x: Column, y: Column, at: Column) -> Column:
    """Per-row natural-cubic-spline interpolation: three array columns →
    array of predictions (same in-tuple execution shape as the
    reference's spline()+predict())."""

    @pandas_udf("array<double>")
    def _f(xs: pd.Series, ys: pd.Series, ats: pd.Series) -> pd.Series:
        out = []
        for xv, yv, av in zip(xs, ys, ats):
            if xv is None or yv is None or av is None or len(xv) < 3:
                out.append(None)
                continue
            out.append(spline_predict_values(list(xv), list(yv), list(av)))
        return pd.Series(out)

    return _f(x, y, at)


# --------------------------------------------------------------------------
# Bicubic grid interpolation (BicubicSplineEvaluator → Commons Math
# BicubicInterpolator): per grid cell, corner values + finite-difference
# partials feed the standard 16-coefficient bicubic surface (the
# published bicubic-interpolation matrix; en.wikipedia Bicubic
# interpolation / Commons Math BicubicInterpolator.java algorithm).

_BICUBIC_AINV = np.array(
    [
        [1, 0, 0, 0], [0, 0, 1, 0], [-3, 3, -2, -1], [2, -2, 1, 1],
    ],
    dtype=float,
)


def bicubic_predict_values(
    xs: list[float], ys: list[float], grid: list[list[float]],
    at: list[tuple[float, float]] | list[list[float]],
) -> list[float]:
    """Interpolate ``grid`` (rows indexed by xs, cols by ys) at the
    (x, y) points ``at`` — BicubicSplineEvaluator's doWork contract."""
    xa = np.asarray(xs, float)
    ya = np.asarray(ys, float)
    g = np.asarray(grid, float)
    # partial derivatives by central differences on the (possibly
    # non-uniform) grid, one-sided at the borders — np.gradient's
    # published scheme matches the interpolator's finite differences
    fx = np.gradient(g, xa, axis=0)
    fy = np.gradient(g, ya, axis=1)
    fxy = np.gradient(fx, ya, axis=1)
    out = []
    for p in at:
        px, py = float(p[0]), float(p[1])
        i = int(np.clip(np.searchsorted(xa, px, side="right") - 1, 0, len(xa) - 2))
        j = int(np.clip(np.searchsorted(ya, py, side="right") - 1, 0, len(ya) - 2))
        hx = xa[i + 1] - xa[i]
        hy = ya[j + 1] - ya[j]
        # unit-cell corner matrix: values + partials scaled by the cell
        # spans (the standard bicubic change of variables)
        Fm = np.array(
            [
                [g[i, j], g[i, j + 1], fy[i, j] * hy, fy[i, j + 1] * hy],
                [g[i + 1, j], g[i + 1, j + 1], fy[i + 1, j] * hy, fy[i + 1, j + 1] * hy],
                [fx[i, j] * hx, fx[i, j + 1] * hx, fxy[i, j] * hx * hy, fxy[i, j + 1] * hx * hy],
                [fx[i + 1, j] * hx, fx[i + 1, j + 1] * hx, fxy[i + 1, j] * hx * hy, fxy[i + 1, j + 1] * hx * hy],
            ]
        )
        a = _BICUBIC_AINV @ Fm @ _BICUBIC_AINV.T
        t = (px - xa[i]) / hx
        u = (py - ya[j]) / hy
        tv = np.array([1.0, t, t * t, t * t * t])
        uv = np.array([1.0, u, u * u, u * u * u])
        out.append(float(tv @ a @ uv))
    return out


def bicubic_predict(xs: Column, ys: Column, grid: Column, at: Column) -> Column:
    """Per-row bicubic interpolation: (array x, array y,
    array<array> grid, array<array[2]> points) → array of predictions."""

    @pandas_udf("array<double>")
    def _f(xc: pd.Series, yc: pd.Series, gc: pd.Series, ac: pd.Series) -> pd.Series:
        out = []
        for xv, yv, gv, av in zip(xc, yc, gc, ac):
            if xv is None or yv is None or gv is None or av is None or len(xv) < 2:
                out.append(None)
                continue
            out.append(
                bicubic_predict_values(
                    list(xv), list(yv), [list(r) for r in gv], [list(p) for p in av]
                )
            )
        return pd.Series(out)

    return _f(xs, ys, grid, at)


# --------------------------------------------------------------------------
# featureSelect (FeatureSelectEvaluator): keep only the named columns of
# a labeled matrix, preserving their original order.  Our labeled
# matrices are (vector DataFrame, vocab) pairs (classify.term_vectors /
# with_labels); the slice is a JVM-side array projection — no shuffle,
# no Python in the hot path.


def feature_select(
    vecs: DataFrame, vocab: list[str], features: list[str],
    vec_col: str = "features", offset: int = 0,
) -> tuple[DataFrame, list[str]]:
    """Reference: io/eval/FeatureSelectEvaluator.java:1 — labels are
    filtered to the requested feature set, rows keep their labels.
    ``offset`` shifts vocab position → array slot (term_vectors vectors
    carry an intercept at slot 0 → offset=1)."""
    want = set(features)
    keep = [(t, i) for i, t in enumerate(vocab) if t in want]
    new_vocab = [t for t, _ in keep]
    arr = F.array(*[F.col(vec_col)[i + offset] for _, i in keep])
    return vecs.withColumn(vec_col, arr), new_vocab
