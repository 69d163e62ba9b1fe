"""Embedding similarity search: brute-force cosine top-k + IVF scale path.

Reference analog (/root/reference/solr/):
- DenseVectorField (dim + similarity): core/.../schema/DenseVectorField.java:1
- {!knn topK=k}: core/.../search/neural/KnnQParser.java:35-81 (HNSW via
  Lucene). HNSW is a single-node graph structure; the Spark-native scale
  path is IVF (coarse quantizer partitioning) — candidate lists become
  ordinary key-partitioned joins.

Design notes at 100 TB:
- Dot products run JVM-side: zip_with + aggregate over array<float> —
  no Python, no shuffle for the brute-force scan (queries broadcast).
- Brute force is the *baseline* (exact, one pass over the corpus per
  query batch). IVF prunes the scan to nprobe/ncentroid of the corpus:
  vectors are pre-assigned to centroids (a materialized column /
  partitioning key), and a query only joins the partitions of its nprobe
  nearest centroids.
- Scores are computed on L2-normalized vectors, so dot == cosine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array<float/double> columns (float64
    accumulation in array order — deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def normalize(a: Column) -> Column:
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "q_vec",
    k: int = 5,
    exclude_self: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the query batch, scan the
    corpus once, per-query window top-k. Returns
    (query_id, neighbor_id, cos_sim) with cos rounded to ``round_to`` dp
    (ranking happens on the ROUNDED value — the oracle contract) and ties
    broken by neighbor_id asc."""
    joined = corpus.crossJoin(F.broadcast(queries))
    if exclude_self:
        joined = joined.filter(F.col(id_col) != F.col(q_id_col))
    scored = joined.select(
        F.col(q_id_col).alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col(q_vec_col)), round_to).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def brute_force_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    round_to: int = 6,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b,
    rounded cosine >= threshold) — the correctness baseline the LSH
    variant (srp_near_dup_pairs) trades recall against. O(n^2)
    dot products but zero shuffle beyond the self-join."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine("v_a", "v_b"), round_to))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def assign_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse assignment: each vector → nearest centroid (by cosine).
    centroids: (centroid_id, c_vec), small → broadcast. In production this
    column is written once at ingest and used as the partition key."""
    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        id_col,
        vec_col,
        "centroid_id",
        cosine(F.col(vec_col), F.col("c_vec")).alias("__sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__sim")
    )


def make_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
) -> DataFrame:
    """Deterministic k-means-lite centroids: seed with the n lowest-id
    vectors, then ``iters`` Lloyd refinement passes (mean of assigned
    vectors, JVM-side aggregate over array elements)."""
    seeds = (
        corpus.orderBy(F.asc(id_col))
        .limit(n_centroids)
        .select(
            F.row_number().over(Window.orderBy(F.asc(id_col))).alias("centroid_id"),
            F.col(vec_col).alias("c_vec"),
        )
    )
    cents = seeds
    dim = None
    for _ in range(iters):
        assigned = assign_centroids(corpus, cents, id_col, vec_col)
        if dim is None:
            dim = len(assigned.select(vec_col).first()[0])
        # element-wise mean per centroid: posexplode + groupBy (centroid, pos)
        flat = assigned.select(
            "centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "val")
        )
        means = (
            flat.groupBy("centroid_id", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "centroid_id",
                F.transform("pm", lambda s: s.getField("m")).alias("c_vec"),
            )
        )
        cents = means
    return cents


def ivf_topk(
    corpus_assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "q_vec",
    k: int = 5,
    exclude_self: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """IVF search: route each query to its nprobe nearest centroids, scan
    only those cells. With nprobe == n_centroids this is EXACTLY the brute
    force result (tested); smaller nprobe trades recall for a
    nprobe/ncentroids fraction of the scan."""
    q2c = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            q_id_col,
            q_vec_col,
            "centroid_id",
            cosine(F.col(q_vec_col), F.col("c_vec")).alias("__sim"),
        )
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("__sim"), F.asc("centroid_id"))
    probes = (
        q2c.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= nprobe)
        .select(q_id_col, q_vec_col, "centroid_id")
    )
    joined = corpus_assigned.join(F.broadcast(probes), "centroid_id")
    if exclude_self:
        joined = joined.filter(F.col(id_col) != F.col(q_id_col))
    scored = joined.select(
        F.col(q_id_col).alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col(q_vec_col)), round_to).alias("cos_sim"),
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(wk))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized residuals (Jégou, Douze, Schmid, "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011 — public). The
# 100 TB posture: the scanned candidate table stores m one-byte codes
# per vector instead of dim×4 raw-float bytes; raw vectors are read only
# for the exact re-rank of the refined candidate set (the same
# verify-after-prune shape as the LSH paths). Reference capability
# anchor: CORE/search/neural/KnnQParser.java:35-81 (topK semantics).


def pq_train(
    corpus_assigned: DataFrame,
    centroids: DataFrame,
    m: int = 8,
    ksub: int = 16,
    sample_cap: int = 10_000,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Train PQ codebooks on coarse-quantizer RESIDUALS. Training runs
    on a deterministic bounded sample (lowest ``sample_cap`` ids — PQ
    codebooks are sample-trained by design, cf. FAISS's train() on a
    corpus subsample), so driver memory is capped at sample_cap×dim
    floats regardless of corpus size. Encoding and search stay fully
    distributed. Returns {"m", "ksub", "dsub", "dim", "codebooks"
    (m,ksub,dsub float64), "centroids" {centroid_id: np.ndarray}}."""
    import numpy as np

    cent_rows = centroids.collect()  # n_centroids × dim — small, broadcast-class
    cmap = {int(r["centroid_id"]): np.asarray(r["c_vec"], dtype=np.float64)
            for r in cent_rows}
    sample = (
        corpus_assigned.select(id_col, vec_col, "centroid_id")
        .orderBy(F.asc(id_col))
        .limit(sample_cap)
        .collect()
    )
    dim = len(sample[0][vec_col])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    res = np.stack([
        np.asarray(r[vec_col], dtype=np.float64) - cmap[int(r["centroid_id"])]
        for r in sample
    ])
    rng = np.random.default_rng(0)
    codebooks = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = res[:, j * dsub:(j + 1) * dsub]
        n = sub.shape[0]
        # deterministic seeded init, then Lloyd
        cb = sub[rng.choice(n, size=min(ksub, n), replace=False)]
        if cb.shape[0] < ksub:  # degenerate tiny sample: pad by repetition
            cb = np.resize(cb, (ksub, dsub))
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(ksub):
                mask = a == c
                if mask.any():
                    cb[c] = sub[mask].mean(axis=0)
        codebooks[j] = cb
    return {"m": m, "ksub": ksub, "dsub": dsub, "dim": dim,
            "codebooks": codebooks, "centroids": cmap}


def pq_encode(
    corpus_assigned: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed PQ encoding: (id, centroid_id) → m subspace codes via
    vectorized numpy argmin over Arrow batches (mapInPandas — no per-row
    Python). Output (id, centroid_id, codes array<int>): the compact
    scan table (m bytes/vector of information; int codes here since
    Spark lacks a uint8 array)."""
    import numpy as np
    import pandas as pd

    mm, ksub, dsub = model["m"], model["ksub"], model["dsub"]
    codebooks, cmap = model["codebooks"], model["centroids"]

    def kern(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack(pdf[vec_col].map(
                lambda v: np.asarray(v, dtype=np.float64)))
            cents = np.stack(pdf["centroid_id"].map(
                lambda c: cmap[int(c)]))
            res = vecs - cents
            codes = np.empty((len(pdf), mm), dtype=np.int64)
            for j in range(mm):
                sub = res[:, j * dsub:(j + 1) * dsub]
                d2 = ((sub[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "centroid_id": pdf["centroid_id"].to_numpy(),
                "codes": list(codes),
            })

    return corpus_assigned.select(id_col, vec_col, "centroid_id").mapInPandas(
        kern, f"{id_col} bigint, centroid_id int, codes array<bigint>"
    )


def ivfpq_topk(
    encoded: DataFrame,
    corpus: DataFrame,
    model: dict,
    queries: DataFrame,
    nprobe: int,
    k: int = 5,
    refine: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "q_vec",
    exclude_self: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """IVF-PQ search: route each query to its ``nprobe`` nearest coarse
    cells; scan ONLY those cells' code tables with asymmetric distance
    computation (per-(cell,query) lookup tables — approx cosine from
    dot(q,c) + Σ_j LUT[j, code_j], with ‖x‖² reconstructed exactly from
    per-cell codeword partials since subspaces are disjoint coordinate
    blocks); keep the top ``refine`` ADC candidates per query; re-rank
    them with EXACT cosine over the raw vectors. Final scores are exact,
    so recall (not score error) is the only approximation — measured in
    tests/test_functions.py against brute force."""
    import numpy as np
    import pandas as pd

    mm, ksub, dsub = model["m"], model["ksub"], model["dsub"]
    codebooks, cmap = model["codebooks"], model["centroids"]

    # query → nprobe nearest cells (centroids are driver-side already)
    q_rows = queries.select(q_id_col, q_vec_col).collect()  # query batch: small by contract
    cent_ids = sorted(cmap)
    cent_mat = np.stack([cmap[c] for c in cent_ids])
    cent_norm = np.sqrt((cent_mat ** 2).sum(axis=1))
    # per-cell codeword partials: dot(c_sub_j, w_jk) and ||w_jk||²
    wnorm = (codebooks ** 2).sum(axis=2)  # (m, ksub)
    cell_cdot = {
        c: np.stack([
            codebooks[j] @ cmap[c][j * dsub:(j + 1) * dsub]
            for j in range(mm)
        ])  # (m, ksub)
        for c in cent_ids
    }
    probes: dict[int, list[tuple[int, np.ndarray]]] = {}
    for r in q_rows:
        qv = np.asarray(r[q_vec_col], dtype=np.float64)
        sims = (cent_mat @ qv) / (cent_norm * np.sqrt(qv @ qv))
        order = np.lexsort((cent_ids, -sims))[:nprobe]
        for oi in order:
            probes.setdefault(cent_ids[int(oi)], []).append(
                (int(r[q_id_col]), qv))

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "query_id": pd.Series([], dtype="int64"),
            "neighbor_id": pd.Series([], dtype="int64"),
            "adc_sim": pd.Series([], dtype="float64"),
        })
        if not len(pdf):
            return empty
        cell = int(pdf["centroid_id"].iloc[0])
        plist = probes.get(cell)
        if not plist:
            return empty
        cvec = cmap[cell]
        codes = np.stack(pdf["codes"].map(np.asarray))  # (n, m)
        ids = pdf[id_col].to_numpy()
        rows_j = np.arange(mm)[:, None]
        # ‖x̂‖² = ‖c‖² + 2·Σ_j dot(c_j, w_j,code) + Σ_j ‖w_j,code‖²
        xnorm2 = (
            float(cvec @ cvec)
            + 2.0 * cell_cdot[cell][rows_j, codes.T].sum(axis=0)
            + wnorm[rows_j, codes.T].sum(axis=0)
        )
        xnorm = np.sqrt(np.maximum(xnorm2, 1e-12))
        outs = []
        for qid, qv in plist:
            lut = np.stack([
                codebooks[j] @ qv[j * dsub:(j + 1) * dsub]
                for j in range(mm)
            ])  # (m, ksub)
            dots = float(qv @ cvec) + lut[rows_j, codes.T].sum(axis=0)
            sims = dots / (np.sqrt(qv @ qv) * xnorm)
            outs.append(pd.DataFrame({
                "query_id": np.full(len(ids), qid, dtype=np.int64),
                "neighbor_id": ids.astype(np.int64),
                "adc_sim": sims,
            }))
        return pd.concat(outs, ignore_index=True)

    cand = encoded.groupBy("centroid_id").applyInPandas(
        kern, "query_id bigint, neighbor_id bigint, adc_sim double"
    )
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("adc_sim"), F.asc("neighbor_id"))
    shortlist = (
        cand.withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") <= refine)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank: raw vectors touched only for refine×n_queries rows
    qdf = queries.select(
        F.col(q_id_col).alias("query_id"), F.col(q_vec_col).alias("__qv"))
    exact = (
        shortlist.join(
            corpus.select(F.col(id_col).alias("neighbor_id"), vec_col),
            "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col(vec_col), F.col("__qv")), round_to)
            .alias("cos_sim"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        exact.withColumn("__rn", F.row_number().over(wk))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def srp_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    bands: int = 8,
    bits_per_band: int = 8,
    seed: int = 13,
    max_bucket_size: int | str | None = "auto",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via signed-random-projection
    LSH (Charikar 2002, "Similarity Estimation Techniques from Rounding
    Algorithms" — public): bit p of a vector's signature is
    sign(v · plane_p) for deterministic seeded Gaussian planes;
    signatures band into ``bands`` buckets of ``bits_per_band`` bits
    (the MinHash-LSH banding scheme applied to SRP bits), candidate
    pairs share ≥1 (band, bucket), and an exact cosine filter restores
    precision.

    Recall math: P[bit agrees] = 1 − θ/π for angle θ; a pair at cosine c
    survives with 1 − (1 − (1 − arccos(c)/π)^r)^b — at the defaults
    (8×8) a 0.95-cosine pair is found with ~99% probability (validated
    against the exact pair set in tests/test_functions.py). Tune r down
    for lower thresholds.

    Scale shape: the signature kernel is one numpy matmul per Arrow
    batch (vectors never leave the executor), candidate generation is a
    groupable self-join keyed (band, bucket) — identical plan family to
    minhash_lsh_pairs, no all-pairs stage anywhere. ``max_bucket_size``
    ("auto" = dedup.AUTO_BUCKET_CAP) drops degenerate hot buckets —
    e.g. many zero or bit-identical vectors sharing every band
    signature — before the self-join goes quadratic; pass None for the
    uncapped test-scale join, and use dedup.lsh_oversized_buckets for
    dropped-bucket accounting."""
    import numpy as np
    import pandas as pd
    from typing import Iterator

    first = corpus.select(vec_col).first()
    if first is None:
        id_t = corpus.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [], f"id_a {id_t}, id_b {id_t}, cos_sim double"
        )
    dim = len(first[0])
    n_planes = bands * bits_per_band
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    weights = (1 << np.arange(bits_per_band, dtype=np.int64))

    # preserve the caller's id type (string UUIDs are as valid as ints)
    id_type = corpus.schema[id_col].dataType.simpleString()
    src = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))

    def kern(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            bits = (V @ planes.T) > 0  # (n, bands*r)
            buckets = bits.reshape(len(pdf), bands, bits_per_band) @ weights
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, bands),
                    "band": np.tile(np.arange(bands, dtype=np.int32), len(pdf)),
                    "bucket": buckets.reshape(-1).astype(np.int64),
                }
            )

    sig = src.mapInPandas(kern, f"id {id_type}, band int, bucket bigint")
    from pyspark import StorageLevel

    from .dedup import _CacheHandle, _cap_buckets

    # persist the banding table: the cap's size aggregate, its anti-join
    # probe and both self-join sides would otherwise each re-run the
    # projection kernel (same fix as minhash_lsh_pairs)
    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    cached = _CacheHandle(sig)
    sig = _cap_buckets(sig, max_bucket_size)
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = src.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    vb = src.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    out = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_sim", F.round(cosine("v_a", "v_b"), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
    # release with out._solr_spark_cached.unpersist() after materializing
    out._solr_spark_cached = cached
    return out


# round-1 name kept as an alias (the component-sign variant it named had
# unvalidated recall and is superseded by the SRP implementation)
embedding_near_dup_pairs = srp_near_dup_pairs


def sq_euclidean(a: Column, b: Column) -> Column:
    """JVM-side squared euclidean distance, folded in element order
    (deterministic)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans(
    corpus: DataFrame,
    k: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    seed_offset: int = 0,
    _with_centroids: bool = False,
) -> DataFrame:
    """Deterministic Lloyd k-means (KmeansEvaluator, Lang.java — the
    reference wraps Commons Math KMeansPlusPlusClusterer; the random
    k-means++ seeding is replaced by the k lowest-id vectors so two
    engines — and two cluster sizes — produce the identical model).
    Euclidean assignment, ties broken by cluster_id asc; after every
    mean update the centroids are ROUNDED to ``round_to`` decimals,
    which quantizes away float summation-order wobble so the next
    iteration's assignment is bit-reproducible under any partitioning
    (and mirrorable by a SQL oracle).

    Returns the assignment frame (id_col, cluster_id). Scale shape: per
    iteration one broadcast of k centroids + one (cluster, dim)-keyed
    aggregation — no all-pairs stage, centroids never leave the plan."""
    seeds = (
        corpus.orderBy(F.asc(id_col))
        .limit(k * (seed_offset + 1))
        .orderBy(F.desc(id_col))
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(F.asc(id_col))).alias("cluster_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("c_vec"),
        )
    )
    cents = seeds
    src = corpus.select(id_col, vec_col)

    def assign(c: DataFrame) -> DataFrame:
        scored = src.crossJoin(F.broadcast(c)).select(
            id_col,
            vec_col,
            "cluster_id",
            sq_euclidean(F.col(vec_col), F.col("c_vec")).alias("__d"),
        )
        w = Window.partitionBy(id_col).orderBy(F.asc("__d"), F.asc("cluster_id"))
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__d")
        )

    for _ in range(iters):
        assigned = assign(cents)
        flat = assigned.select(
            "cluster_id", F.posexplode(F.col(vec_col)).alias("pos", "val")
        )
        cents = (
            flat.groupBy("cluster_id", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), round_to).alias("m"))
            .groupBy("cluster_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cluster_id",
                F.transform("pm", lambda s: s.getField("m")).alias("c_vec"),
            )
        )
    if _with_centroids:
        return assign(cents).select(id_col, "cluster_id"), cents
    return assign(cents).select(id_col, "cluster_id")


def kmeans_model(
    corpus: DataFrame,
    k: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    seed_offset: int = 0,
) -> dict:
    """kmeans(...) as a model tuple — the reference's KmeansEvaluator
    returns a clustering result whose attributes feed getCentroids /
    getCluster / getMembershipMatrix (Lang.java; lets.get_attribute
    reads them). Both members stay DataFrames (nothing collects):
    ``assignments`` (id, cluster_id) and ``centroids``
    (cluster_id, c_vec) — the EXACT centroids that produced the final
    assignment, not a post-hoc recompute."""
    assignments, centroids = kmeans(
        corpus, k, iters, id_col, vec_col, round_to, seed_offset,
        _with_centroids=True,
    )
    return {"assignments": assignments, "centroids": centroids, "k": k}


def get_centroids(model: dict) -> DataFrame:
    """getCentroids(model) (GetCentroidsEvaluator): the centroid matrix
    as a (cluster_id, c_vec) frame, cluster-ordered."""
    return model["centroids"].orderBy("cluster_id")


def get_cluster(model: dict, corpus: DataFrame, cluster_id: int,
                id_col: str = "vec_id") -> DataFrame:
    """getCluster(model, i) (GetClusterEvaluator): the member rows of
    one cluster — a filtered semi-join, the corpus never collects."""
    members = model["assignments"].where(
        F.col("cluster_id") == int(cluster_id)
    ).select(id_col)
    return corpus.join(F.broadcast(members), id_col, "left_semi")


def fuzzy_kmeans(
    corpus: DataFrame,
    k: int,
    iters: int = 2,
    fuzziness: float = 2.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    seed_offset: int = 0,
) -> DataFrame:
    """Fuzzy c-means (FuzzyKmeansEvaluator — Commons Math
    FuzzyKMeansClusterer), deterministic like kmeans(): lowest-id seeds,
    membership u_ic = 1 / Σ_j (d_ic/d_ij)^(2/(m−1)), centroids are the
    u^m-weighted means (rounded per iteration). Returns the membership
    frame (id_col, cluster_id, membership) — one row per (point,
    cluster). Same scale shape as kmeans: broadcast centroids, one
    keyed aggregation per iteration."""
    if fuzziness <= 1.0:
        raise ValueError("fuzziness m must be > 1")
    expo = 2.0 / (fuzziness - 1.0)
    seeds = (
        corpus.orderBy(F.asc(id_col))
        .limit(k * (seed_offset + 1))
        .orderBy(F.desc(id_col))
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(F.asc(id_col))).alias("cluster_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("c_vec"),
        )
    )
    src = corpus.select(id_col, vec_col)

    def memberships(c: DataFrame) -> DataFrame:
        d = src.crossJoin(F.broadcast(c)).select(
            id_col,
            vec_col,
            "cluster_id",
            # epsilon floor: a point ON a centroid gets membership ~1 there
            F.greatest(
                sq_euclidean(F.col(vec_col), F.col("c_vec")), F.lit(1e-12)
            ).alias("__d"),
        )
        w = Window.partitionBy(id_col)
        denom = F.sum(F.pow(F.col("__d"), F.lit(-expo / 2.0))).over(w)
        return d.withColumn(
            "membership",
            F.pow(F.col("__d"), F.lit(-expo / 2.0)) / denom,
        ).drop("__d")

    cents = seeds
    for _ in range(iters):
        m = memberships(cents)
        wgt = F.pow(F.col("membership"), F.lit(float(fuzziness)))
        flat = m.select(
            "cluster_id", wgt.alias("__w"),
            F.posexplode(F.col(vec_col)).alias("pos", "val"),
        )
        cents = (
            flat.groupBy("cluster_id", "pos")
            .agg(
                F.round(
                    F.sum(F.col("__w") * F.col("val").cast("double"))
                    / F.sum("__w"),
                    round_to,
                ).alias("m")
            )
            .groupBy("cluster_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cluster_id",
                F.transform("pm", lambda s: s.getField("m")).alias("c_vec"),
            )
        )
    return memberships(cents).select(id_col, "cluster_id", "membership")


def multi_kmeans(
    corpus: DataFrame,
    k: int,
    trials: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """multiKmeans (MultiKmeansEvaluator → repeated Commons Math
    KMeansPlusPlusClusterer, keep-lowest-SSE): run :func:`kmeans`
    ``trials`` times and keep the assignment with the lowest total
    within-cluster squared error. The reference restarts with random
    seeds; here trial t seeds from the t-th block of k lowest-id vectors
    (``seed_offset``), so the winner is deterministic and reproducible
    across cluster sizes. Per trial: the kmeans plan plus ONE scalar
    collect (the SSE) — the corpus never leaves the cluster."""
    best: DataFrame | None = None
    best_sse: float | None = None
    for t in range(trials):
        assign = kmeans(corpus, k, iters, id_col, vec_col, round_to, seed_offset=t)
        flat = assign.join(corpus.select(id_col, vec_col), id_col).select(
            "cluster_id", vec_col
        )
        cents = (
            flat.select("cluster_id", F.posexplode(F.col(vec_col)).alias("pos", "val"))
            .groupBy("cluster_id", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), round_to).alias("m"))
            .groupBy("cluster_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cluster_id",
                F.transform("pm", lambda s: s.getField("m")).alias("c_vec"),
            )
        )
        row = (
            flat.join(F.broadcast(cents), "cluster_id")
            .agg(F.sum(sq_euclidean(F.col(vec_col), F.col("c_vec"))).alias("sse"))
            .collect()[0]
        )
        sse = float(row.sse or 0.0)
        if best_sse is None or sse < best_sse:
            best_sse, best = sse, assign
    assert best is not None
    return best
