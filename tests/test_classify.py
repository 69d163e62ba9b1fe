"""train()/classify() logistic regression: numpy-mirror equivalence of
the batch-GD step, loss descent, and separable-data accuracy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _np_train(X: np.ndarray, y: np.ndarray, alpha: float, iters: int):
    """Reference implementation of the exact same batch-GD recurrence."""
    w = np.zeros(X.shape[1])
    losses = []
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        eps = 1e-12
        losses.append(
            float(np.mean(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))))
        )
        grad = (p - y) @ X / len(y)
        w = w - alpha * grad
    return w, losses


@pytest.fixture(scope="module")
def toy(spark):
    rng = np.random.default_rng(7)
    n = 200
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    y = ((1.5 * x1 - 2.0 * x2) > 0).astype(int)  # linearly separable
    X = np.column_stack([np.ones(n), x1, x2])
    rows = [
        (int(i), [1.0, float(a), float(b)], int(c))
        for i, (a, b, c) in enumerate(zip(x1, x2, y))
    ]
    df = spark.createDataFrame(rows, "id bigint, features array<double>, y int")
    return df, X, y


def test_train_matches_numpy(spark, toy):
    from solr_spark.functions.classify import train_logreg

    df, X, y = toy
    w, losses = train_logreg(df, "y", alpha=0.5, iterations=10)
    wn, ln = _np_train(X, y, 0.5, 10)
    assert w == pytest.approx(wn.tolist(), rel=1e-9, abs=1e-9)
    assert losses == pytest.approx(ln, rel=1e-9, abs=1e-9)


def test_loss_descends_and_separates(spark, toy):
    from solr_spark.functions.classify import classify, train_logreg

    df, X, y = toy
    w, losses = train_logreg(df, "y", alpha=0.5, iterations=25)
    assert losses[-1] < losses[0] * 0.6  # real descent
    out = classify(df, w).select("y", "prediction").collect()
    acc = sum(1 for r in out if r["y"] == r["prediction"]) / len(out)
    assert acc >= 0.95


def test_tfidf_vectors_shape(spark):
    from solr_spark.functions.classify import tfidf_vectors

    doc_terms = spark.createDataFrame(
        [(0, "a"), (0, "b"), (1, "b"), (2, "c")], "doc_id bigint, term string"
    )
    out = tfidf_vectors(
        doc_terms, "doc_id", "term", None, ["a", "b"], 3, {"a": 1, "b": 2}
    ).collect()
    by = {r["doc_id"]: r["features"] for r in out}
    import math

    idf_a, idf_b = math.log(3 / 2.0), math.log(3 / 3.0)
    assert by[0] == pytest.approx([1.0, idf_a, idf_b])
    assert by[1] == pytest.approx([1.0, 0.0, idf_b])
    assert by[2] == pytest.approx([1.0, 0.0, 0.0])  # no vocab terms: intercept only


def test_term_vectors_vocab_cap(spark):
    """A vocabulary larger than max_vocab completes with bounded driver
    state: the Spark-side limit keeps top max_vocab by (df desc, term
    asc) and the companion frame reports the drop."""
    from solr_spark.functions.classify import term_vectors, term_vectors_dropped

    rows = []
    # 50 singleton terms + 3 common terms spread over 10 docs
    for d in range(10):
        rows.append((d, f"rare_{d:02d}_a"))
        rows.append((d, f"rare_{d:02d}_b"))
        rows.append((d, f"rare_{d:02d}_c"))
        rows.append((d, f"rare_{d:02d}_d"))
        rows.append((d, f"rare_{d:02d}_e"))
        for t in ("commonx", "commony", "commonz"):
            rows.append((d, t))
    doc_terms = spark.createDataFrame(rows, "doc_id bigint, term string")

    vecs, vocab = term_vectors(doc_terms, "doc_id", "term", max_vocab=8)
    assert len(vocab) == 8
    # highest-df terms survive the cap
    assert {"commonx", "commony", "commonz"} <= set(vocab)
    # vectors are intercept + capped vocab wide
    assert all(len(r["features"]) == 9 for r in vecs.collect())

    drop = term_vectors_dropped(doc_terms, "doc_id", "term", max_vocab=8).collect()[0]
    assert drop["n_terms_in_band"] == 53
    assert drop["n_terms_kept"] == 8
    assert drop["n_terms_dropped"] == 45

    # cap disabled: full band, zero drop
    _, vocab_all = term_vectors(doc_terms, "doc_id", "term", max_vocab=None)
    assert len(vocab_all) == 53
    drop0 = term_vectors_dropped(
        doc_terms, "doc_id", "term", max_vocab=None
    ).collect()[0]
    assert drop0["n_terms_dropped"] == 0
