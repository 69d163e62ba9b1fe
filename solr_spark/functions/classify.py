"""Text classification: logistic-regression train + classify streams.

Reference: the train()/classify() streaming expressions —
`solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/stream/
TextLogitStream.java:74-117` (iterative weight shipping) driving
`solr/core/src/java/org/apache/solr/search/
TextLogisticRegressionQParserPlugin.java:76-237` (per-doc sigmoid /
error / alpha·gradient updates over tf-idf features), and
ClassifyStream applying the trained weights.

Deviation (documented): the reference updates weights sequentially
per document inside each shard scan, which makes the result depend on
document order. Here each iteration is one BATCH gradient step —
grad = Σ (sigmoid(x·w) − y)·x / n over ALL docs — so training is
deterministic at any parallelism (the same exactness-over-incident-order
stance as the engine's ExactStatsCache-style global IDF). Features are
position-indexed tf-idf vectors over a fixed vocabulary; one tiny
shuffle (vocabulary-sized) per iteration.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tfidf_vectors(
    doc_terms: DataFrame,
    id_col: str,
    term_col: str,
    tf_col: str | None,
    vocab: list[str],
    n_docs: int,
    df_map: dict[str, int],
) -> DataFrame:
    """Per-doc dense tf-idf vector over ``vocab`` (position-indexed,
    +intercept slot 0 = 1.0). idf = log(n/(df+1)) — the reference's
    TextLogitStream idf shape. Docs with no vocab terms get the
    intercept-only vector."""
    vpos = {t: i + 1 for i, t in enumerate(vocab)}  # slot 0 = intercept
    idfs = [0.0] + [math.log(n_docs / (df_map.get(t, 0) + 1.0)) for t in vocab]
    dim = len(vocab) + 1
    spark = doc_terms.sparkSession
    vocab_df = F.broadcast(
        spark.createDataFrame(
            [(t, vpos[t], idfs[vpos[t]]) for t in vocab],
            "term string, __pos int, __idf double",
        ).withColumnRenamed("term", term_col)
    )
    tf = F.col(tf_col).cast("double") if tf_col else F.lit(1.0)
    pairs = (
        doc_terms.join(vocab_df, term_col)
        .select(id_col, "__pos", (tf * F.col("__idf")).alias("__v"))
        # duplicate (id, term) rows sum their contributions (tf semantics)
        # BEFORE the map build — map_from_entries throws on duplicate keys
        .groupBy(id_col, "__pos")
        .agg(F.sum("__v").alias("__v"))
        .groupBy(id_col)
        .agg(F.map_from_entries(F.collect_list(F.struct("__pos", "__v"))).alias("__m"))
    )
    slots = F.array(
        *[
            (F.lit(1.0) if i == 0 else F.coalesce(F.col("__m").getItem(i), F.lit(0.0)))
            for i in range(dim)
        ]
    )
    ids = doc_terms.select(id_col).dropDuplicates([id_col])
    return (
        ids.join(pairs, id_col, "left")
        .withColumn(
            "features",
            F.when(F.col("__m").isNull(), F.array(F.lit(1.0), *[F.lit(0.0)] * (dim - 1))).otherwise(slots),
        )
        .drop("__m")
    )


def _dot(x: Column, w: list[float]) -> Column:
    total = F.lit(0.0)
    for i, wi in enumerate(w):
        total = total + F.lit(float(wi)) * F.element_at(x, i + 1)
    return total


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_logreg(
    features: DataFrame,
    label_col: str,
    alpha: float = 0.5,
    iterations: int = 20,
    feature_col: str = "features",
) -> tuple[list[float], list[float]]:
    """Batch gradient descent. Returns (weights, per-iteration log-loss).

    Each iteration is ONE Spark job: error per doc as a Catalyst
    expression with the current weights folded in as literals, gradient
    components via posexplode + groupBy(pos) (vocabulary-sized shuffle),
    weights collected to the driver (V+1 doubles — the same tiny state
    TextLogitStream ships between iterations)."""
    feats = features.select(
        F.col(feature_col).alias("x"), F.col(label_col).cast("double").alias("y")
    )
    feats = feats.persist()
    n = feats.count()
    dim = int(feats.select(F.size("x")).first()[0])
    w = [0.0] * dim
    losses: list[float] = []
    for _ in range(iterations):
        err = (_sigmoid(_dot(F.col("x"), w)) - F.col("y")).alias("err")
        p = _sigmoid(_dot(F.col("x"), w))
        eps = F.lit(1e-12)
        loss_expr = -(
            F.col("y") * F.log(p + eps)
            + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p + eps)
        )
        stepped = feats.select(err, F.col("x"), loss_expr.alias("l"))
        grad_rows = (
            stepped.select(
                "l", F.posexplode(F.transform("x", lambda v: v * F.col("err")))
            )
            .groupBy("pos")
            .agg(F.sum("col").alias("g"), F.sum("l").alias("lsum"))
            .collect()
        )
        grad = [0.0] * dim
        total_loss = 0.0
        for r in grad_rows:
            grad[int(r["pos"])] = float(r["g"]) / n
            total_loss = float(r["lsum"])  # same per row; loss summed once
        losses.append(total_loss / n)
        w = [wi - alpha * gi for wi, gi in zip(w, grad)]
    feats.unpersist()
    return w, losses


def classify(
    features: DataFrame,
    weights: list[float],
    threshold: float = 0.5,
    feature_col: str = "features",
) -> DataFrame:
    """ClassifyStream: apply trained weights — probability + thresholded
    prediction as Catalyst columns."""
    p = _sigmoid(_dot(F.col(feature_col), weights))
    return features.withColumn("probability", p).withColumn(
        "prediction", (p >= F.lit(float(threshold))).cast("int")
    )


def term_vectors(
    doc_terms: DataFrame,
    id_col: str,
    term_col: str,
    min_df: int = 1,
    max_df_ratio: float = 1.0,
    max_vocab: int | None = 65_536,
) -> tuple[DataFrame, list[str]]:
    """termVectors (TermVectorsEvaluator): tf-idf document/term matrix
    with column labels. ``doc_terms`` is a (doc, term) stream (duplicates
    = term frequency, like the reference's analyzed field); terms are
    pruned by ``min_df`` / ``max_df_ratio`` exactly as the evaluator's
    minDocFreq/maxDocFreq knobs. Returns (rows, vocab): one row per doc
    with a dense vector positioned by the sorted vocab — the labeled
    matrix the reference feeds to kmeans/clustering evaluators.

    The vocab is collected to the driver, but only AFTER the df pruning
    AND the ``max_vocab`` cap: if the df band still admits more than
    ``max_vocab`` terms, the top ``max_vocab`` by (df desc, term asc)
    are kept — the Spark-side ``limit`` runs BEFORE the collect, so
    driver memory is bounded even when the band is adversarial (a
    100 TB corpus with an unlucky min_df/max_df choice). The drop is
    observable via term_vectors_dropped() (the lsh_oversized_buckets
    pattern). ``max_vocab=None`` disables the cap (the reference's
    TextLogitStream behavior, which ships the whole terms list)."""
    n_docs = doc_terms.select(id_col).distinct().count()
    max_df = int(max_df_ratio * n_docs)
    dfs = (
        doc_terms.select(id_col, term_col)
        .distinct()
        .groupBy(term_col)
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter((F.col("__df") >= min_df) & (F.col("__df") <= max_df))
    )
    if max_vocab is not None:
        dfs = dfs.orderBy(F.desc("__df"), F.asc(term_col)).limit(int(max_vocab))
    pairs = [(r[0], int(r[1])) for r in dfs.collect()]
    vocab = sorted(t for t, _ in pairs)
    df_map = dict(pairs)
    tf = (
        doc_terms.groupBy(id_col, term_col)
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    vecs = tfidf_vectors(tf, id_col, term_col, "__tf", vocab, n_docs, df_map)
    return vecs, vocab


def term_vectors_dropped(
    doc_terms: DataFrame,
    id_col: str,
    term_col: str,
    min_df: int = 1,
    max_df_ratio: float = 1.0,
    max_vocab: int | None = 65_536,
) -> DataFrame:
    """One-row DataFrame (n_terms_in_band, n_terms_kept,
    n_terms_dropped) — the pipeline-logging companion of the
    term_vectors max_vocab cap, so a capped run reports what it
    skipped (the lsh_oversized_buckets pattern)."""
    n_docs = doc_terms.select(id_col).distinct().count()
    max_df = int(max_df_ratio * n_docs)
    band = (
        doc_terms.select(id_col, term_col)
        .distinct()
        .groupBy(term_col)
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter((F.col("__df") >= min_df) & (F.col("__df") <= max_df))
    )
    cap = F.lit(int(max_vocab)) if max_vocab is not None else None
    agg = band.agg(F.count(F.lit(1)).alias("n_terms_in_band"))
    if cap is None:
        return agg.select(
            "n_terms_in_band",
            F.col("n_terms_in_band").alias("n_terms_kept"),
            F.lit(0).cast("bigint").alias("n_terms_dropped"),
        )
    return agg.select(
        "n_terms_in_band",
        F.least(F.col("n_terms_in_band"), cap.cast("bigint")).alias("n_terms_kept"),
        F.greatest(
            F.col("n_terms_in_band") - cap.cast("bigint"), F.lit(0).cast("bigint")
        ).alias("n_terms_dropped"),
    )
