"""LTR models, complexphrase/proximity span verification, and the second
evaluator batch (movingMedian / covariance / percentRank / describe / ema).

The gate-entry oracles cover the DuckDB differential path (test_gate.py);
these tests pin the semantics directly: hand-computed expectations and a
pandas cross-check for the EMA recurrence.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# LTR


def test_linear_model_scores_head_only(spark):
    from solr_spark.functions.ltr import Feature, LinearModel, ltr_rerank

    df = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(20)], "id bigint, score double"
    )
    model = LinearModel(
        features=[Feature("orig", F.col("score"))], weights={"orig": 2.0}
    )
    out = ltr_rerank(
        df, ["id"], [F.desc("score"), F.asc("id")], rerank_docs=5, model=model
    ).toPandas().set_index("id")["ltr_score"]
    # head = ids 0..4 (highest original scores): doubled; tail unchanged
    for i in range(20):
        expect = 2.0 * (100.0 - i) if i < 5 else 100.0 - i
        assert out[i] == expect, (i, out[i])


def test_linear_model_normalizers(spark):
    from solr_spark.functions.ltr import Feature, LinearModel

    df = spark.createDataFrame([(50.0,)], "v double")
    minmax = Feature("f", F.col("v"), norm=("minmax", 0.0, 100.0))
    std = Feature("g", F.col("v"), norm=("standard", 40.0, 5.0))
    m = LinearModel(features=[minmax, std], weights={"f": 1.0, "g": 1.0})
    got = df.select(m.score().alias("s")).collect()[0]["s"]
    assert got == pytest.approx(0.5 + 2.0)


def test_trees_model_branching(spark):
    from solr_spark.functions.ltr import Feature, TreeNode, TreesModel

    # one tree: f <= 10 -> 1.0 else (g <= 0.5 -> 2.0 else 3.0)
    tree = TreeNode(
        feature="f",
        threshold=10.0,
        left=TreeNode(value=1.0),
        right=TreeNode(
            feature="g",
            threshold=0.5,
            left=TreeNode(value=2.0),
            right=TreeNode(value=3.0),
        ),
    )
    model = TreesModel(
        features=[Feature("f", F.col("f")), Feature("g", F.col("g"))],
        trees=[(10.0, tree)],
    )
    df = spark.createDataFrame(
        [(5.0, 0.9), (15.0, 0.1), (15.0, 0.9)], "f double, g double"
    )
    got = [r["s"] for r in df.select(model.score().alias("s")).collect()]
    assert got == [10.0, 20.0, 30.0]


# ---------------------------------------------------------------------------
# complexphrase / proximity span semantics (tiny hand-built corpus)


@pytest.fixture(scope="module")
def span_docs(spark, tmp_path_factory):
    rows = [
        (0, "spark window merge join", "en", "s0", 23),
        (1, "spark windows are wide", "en", "s0", 22),
        (2, "merge then spark later", "en", "s0", 22),
        (3, "spark alpha beta gamma merge", "en", "s0", 28),
        (4, "merge spark", "en", "s0", 11),
        (5, "wind spark", "en", "s0", 10),
    ]
    d = tmp_path_factory.mktemp("span") / "sf"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_complexphrase_wildcard_slot(spark, span_docs):
    from solr_spark.engine import gate_complexphrase

    got = sorted(
        r["doc_id"]
        for r in gate_complexphrase(spark, span_docs, "spark wind*", k=10).collect()
    )
    # 'spark window' (0) and 'spark windows' (1); NOT 'wind spark' (5)
    assert got == [0, 1]


def test_proximity_ordered_vs_unordered(spark, span_docs):
    from solr_spark.engine import gate_proximity

    ordered = sorted(
        r["doc_id"]
        for r in gate_proximity(
            spark, span_docs, "spark", "merge", slop=3, ordered=True, k=10
        ).collect()
    )
    # doc0: spark@1 merge@3 (dist 2 ok); doc3: spark@1 merge@5 (dist 4 > 3);
    # doc2/doc4: merge BEFORE spark -> ordered misses them
    assert ordered == [0]
    unordered = sorted(
        r["doc_id"]
        for r in gate_proximity(
            spark, span_docs, "spark", "merge", slop=3, ordered=False, k=10
        ).collect()
    )
    # adds doc2 (merge@1 spark@3, |dist| 2) and doc4 (adjacent, |dist| 1)
    assert unordered == [0, 2, 4]


# ---------------------------------------------------------------------------
# evaluator batch 2


def test_moving_median_frames(spark):
    from solr_spark.functions import evaluators

    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7])],
        "g int, i int, v double",
    )
    out = (
        evaluators.moving_median(df, ["g"], [F.asc("i")], "v", 3)
        .orderBy("i")
        .toPandas()["moving_median"]
        .tolist()
    )
    # frames: [5] [5,1] [5,1,9] [1,9,3] [9,3,7] -> 5, 3, 5, 3, 7
    assert out == [5.0, 3.0, 5.0, 3.0, 7.0]


def test_covariance_matches_pandas(spark):
    from solr_spark.functions import evaluators

    xs = [1.0, 2.0, 4.0, 8.0, 16.0]
    ys = [3.0, 1.0, 5.0, 2.0, 9.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    got = evaluators.covariance(df, "x", "y", scale=4).collect()[0]
    s = pd.DataFrame({"x": xs, "y": ys})
    assert got["cov_samp"] == pytest.approx(s.cov().loc["x", "y"])
    assert got["cov_pop"] == pytest.approx(s.cov(ddof=0).loc["x", "y"])


def test_describe_quartiles(spark):
    from solr_spark.functions import evaluators

    df = spark.createDataFrame([(float(v),) for v in range(1, 6)], "v double")
    got = evaluators.describe(df, "v").collect()[0]
    assert (got["n"], got["mean"], got["min"], got["max"]) == (5, 3.0, 1.0, 5.0)
    assert (got["p25"], got["p50"], got["p75"]) == (2.0, 3.0, 4.0)


def test_ema_matches_pandas_ewm(spark):
    from solr_spark.functions import evaluators

    vals = [3.0, 7.0, 1.0, 9.0, 4.0, 6.0]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)]
        + [("b", i, v * 2) for i, v in enumerate(vals[:3])],
        "g string, i int, v double",
    )
    out = evaluators.ema(df, ["g"], [F.asc("i")], "v", alpha=0.3).toPandas()
    for g, series in (("a", vals), ("b", [v * 2 for v in vals[:3]])):
        got = (
            out[out["g"] == g].sort_values("i")["ema"].to_numpy()
        )
        want = (
            pd.Series(series).ewm(alpha=0.3, adjust=False).mean().to_numpy()
        )
        assert got == pytest.approx(want), g


def test_vector_batch2(spark):
    from solr_spark.functions.evaluators import VECTOR

    df = spark.createDataFrame([([3.0, 4.0],)], "a array<double>")
    row = df.select(
        VECTOR["mean"](F.col("a")).alias("mean"),
        VECTOR["variance"](F.col("a")).alias("var"),
        VECTOR["norm2"](F.col("a")).alias("n2"),
        VECTOR["unitize"](F.col("a")).alias("u"),
        VECTOR["scale"](F.lit(2.0), F.col("a")).alias("s"),
    ).collect()[0]
    assert row["mean"] == pytest.approx(3.5)
    assert row["var"] == pytest.approx(0.25)
    assert row["n2"] == pytest.approx(5.0)
    assert row["u"] == pytest.approx([0.6, 0.8])
    assert row["s"] == [6.0, 8.0]


def test_from_model_json_linear(spark):
    """Parse the reference model-store linear format ('0.0f'-style floats,
    MinMaxNormalizer params) and score with it."""
    from solr_spark.functions.ltr import from_model_json

    spec = {
        "class": "org.apache.solr.ltr.model.LinearModel",
        "name": "m",
        "features": [
            {"name": "a"},
            {
                "name": "b",
                "norm": {
                    "class": "org.apache.solr.ltr.norm.MinMaxNormalizer",
                    "params": {"min": "0.0f", "max": "10.0f"},
                },
            },
        ],
        "params": {"weights": {"a": 2.0, "b": "1.0f"}},
    }
    model = from_model_json(spec, {"a": F.col("a"), "b": F.col("b")})
    df = spark.createDataFrame([(3.0, 5.0)], "a double, b double")
    got = df.select(model.score().alias("s")).collect()[0]["s"]
    assert got == pytest.approx(2.0 * 3.0 + 1.0 * 0.5)


def test_from_model_json_trees(spark):
    from solr_spark.functions.ltr import from_model_json

    spec = {
        "class": "org.apache.solr.ltr.model.MultipleAdditiveTreesModel",
        "features": [{"name": "f"}],
        "params": {
            "trees": [
                {
                    "weight": "1f",
                    "root": {
                        "feature": "f",
                        "threshold": "0.5f",
                        "left": {"value": "-100"},
                        "right": {"value": "75"},
                    },
                },
                {"weight": "2f", "root": {"value": "-10"}},
            ]
        },
    }
    model = from_model_json(spec, {"f": F.col("f")})
    df = spark.createDataFrame([(0.0,), (1.0,)], "f double")
    got = [r["s"] for r in df.select(model.score().alias("s")).collect()]
    assert got == [-100.0 - 20.0, 75.0 - 20.0]


def test_from_model_json_missing_feature_errors():
    from solr_spark.functions.ltr import from_model_json

    with pytest.raises(KeyError):
        from_model_json(
            {"class": "x.LinearModel", "features": [{"name": "nope"}], "params": {}},
            {},
        )


def test_scalar_vector_batch3(spark):
    from solr_spark.functions.evaluators import SCALAR, VECTOR

    df = spark.createDataFrame(
        [(3.0, 4.0, [1.0, 2.0], [10.0, 20.0])],
        "x double, y double, a array<double>, b array<double>",
    )
    row = df.select(
        SCALAR["hypot"](F.col("x"), F.col("y")).alias("h"),
        SCALAR["atan2"](F.col("y"), F.col("x")).alias("at"),
        SCALAR["sgn"](F.lit(-7.0)).alias("sg"),
        VECTOR["ebeAdd"](F.col("a"), F.col("b")).alias("add"),
        VECTOR["ebeMultiply"](F.col("a"), F.col("b")).alias("mul"),
        VECTOR["zeros"](3).alias("z"),
        VECTOR["sequence"](F.lit(1), F.lit(3), F.lit(1)).alias("seq"),
    ).collect()[0]
    import math

    assert row["h"] == pytest.approx(5.0)
    assert row["at"] == pytest.approx(math.atan2(4.0, 3.0))
    assert row["sg"] == -1.0
    assert row["add"] == [11.0, 22.0]
    assert row["mul"] == [10.0, 40.0]
    assert row["z"] == [0.0, 0.0, 0.0]
    assert row["seq"] == [1.0, 2.0, 3.0]


def test_trees_model_null_nan_route_left(spark):
    """Missing (NULL) and NaN feature values take the LEFT branch — the
    reference's <=-left convention."""
    from solr_spark.functions.ltr import Feature, TreeNode, TreesModel

    tree = TreeNode(
        feature="f", threshold=1.0,
        left=TreeNode(value=-5.0), right=TreeNode(value=5.0),
    )
    model = TreesModel(features=[Feature("f", F.col("f"))], trees=[(1.0, tree)])
    df = spark.createDataFrame(
        [(None,), (float("nan"),), (0.5,), (2.0,)], "f double"
    )
    got = [r["s"] for r in df.select(model.score().alias("s")).collect()]
    assert got == [-5.0, -5.0, -5.0, 5.0]


def test_complexphrase_literal_underscore(spark, span_docs, tmp_path_factory):
    """Literal '_' in a wildcard slot must NOT act as a single-char
    wildcard (snake_case identifiers are ordinary tokens)."""
    d = tmp_path_factory.mktemp("uscore") / "sf"
    d.mkdir()
    rows = [
        (0, "call get_value now", "en", "s0", 18),
        (1, "call getXvalue now", "en", "s0", 18),
        (2, "call get_value_impl now", "en", "s0", 23),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    from solr_spark.engine import gate_complexphrase

    got = sorted(
        r["doc_id"]
        for r in gate_complexphrase(spark, str(d), "call get_value*", k=10).collect()
    )
    # matches get_value and get_value_impl; getXvalue must NOT match
    assert got == [0, 2]


def test_gate_search_does_not_mutate_query(spark, span_docs):
    from solr_spark.engine import gate_search
    from solr_spark.qparser import parse

    q = parse('"spark window" merge lang:en')
    before = (dict(q.optional), [list(p) for p in q.phrases], dict(q.filters))
    gate_search(spark, span_docs, q, k=5).collect()
    after = (dict(q.optional), [list(p) for p in q.phrases], dict(q.filters))
    assert before == after
    # and a second run over the same object returns the same rows
    a = gate_search(spark, span_docs, q, k=5).collect()
    b = gate_search(spark, span_docs, q, k=5).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_external_model_matches_linear_fold(spark):
    """The pandas-UDF external-model slot: a numpy callable that mirrors
    a LinearModel must rescore identically to the Catalyst-folded path;
    a genuinely non-foldable callable (clipped interaction) also runs
    through the same rerank plan."""
    import numpy as np
    from pyspark.sql import functions as F

    from solr_spark.functions.ltr import (
        ExternalModel,
        Feature,
        LinearModel,
        ltr_rerank,
    )

    rows = [(i, float(100 - i), float(i % 7), float((i * 13) % 5)) for i in range(60)]
    df = spark.createDataFrame(rows, "id bigint, score double, f1 double, f2 double")
    feats = [
        Feature("f1", F.col("f1")),
        Feature("f2", F.col("f2"), norm=("minmax", 0.0, 4.0)),
    ]
    lin = LinearModel(features=feats, weights={"f1": 0.5, "f2": 2.0})
    ext = ExternalModel(
        features=feats,
        predict_fn=lambda X: X[:, 0] * 0.5 + X[:, 1] * 2.0,
    )
    args = (["id"], [F.desc("score"), F.asc("id")], 20)
    a = ltr_rerank(df, *args, lin).orderBy("id").collect()
    b = ltr_rerank(df, *args, ext).orderBy("id").collect()
    assert [round(r["ltr_score"], 9) for r in a] == [
        round(r["ltr_score"], 9) for r in b
    ]

    clipped = ExternalModel(
        features=feats,
        predict_fn=lambda X: np.clip(X[:, 0] * X[:, 1], 0.0, 3.0),
    )
    out = ltr_rerank(df, *args, clipped).collect()
    head = [r for r in out if r["id"] < 20]
    assert all(0.0 <= r["ltr_score"] <= 3.0 for r in head)
