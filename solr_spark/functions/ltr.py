"""Learning-to-rank re-scoring — the reference's LTR module re-expressed
as Catalyst expressions over the rerank head.

Reference (paths under /root/reference/solr/modules/ltr/src/java/org/apache/solr/ltr/):
- model contract + rescoring loop: `model/LTRScoringModel.java:1`,
  `LTRRescorer.java:149-235` (rescore only the top rerank_docs of the
  main ranking, keep the tail at the original score)
- linear model: `model/LinearModel.java:33-76` (score = Σ w_i · f_i over
  normalized feature values)
- GBDT ensemble: `model/MultipleAdditiveTreesModel.java:60-140` (sum of
  regression trees, each a threshold-branch chain)
- normalizers: `norm/MinMaxNormalizer.java:30-56`,
  `norm/StandardNormalizer.java:29-54`, `norm/IdentityNormalizer.java`
- features: `feature/FieldValueFeature.java`, `feature/OriginalScoreFeature.java`

Spark-first shape: a feature is ANY Column expression over the candidate
row (field values, the original score, function queries), so feature
extraction is whole-stage-codegen'd — no per-doc Python, no feature
store round-trip. The model itself compiles to one Column: a linear
model folds to a weighted sum; a tree ensemble folds each tree to nested
CASE WHEN and sums the leaves. Rescoring rides the same
top-k + broadcast-anti-join plan as windowed.rerank, so the full corpus
is never globally sorted: the head is TakeOrdered(rerank_docs), the tail
is untouched.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd  # module-level: pandas_udf type hints must resolve

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Feature:
    """One named feature: a Column expression plus an optional normalizer
    (norm/Normalizer.java contract — normalization happens before the
    model sees the value)."""

    name: str
    expr: Column
    # ("identity") | ("minmax", min, max) | ("standard", avg, std)
    norm: tuple = ("identity",)

    def normalized(self) -> Column:
        kind = self.norm[0]
        if kind == "identity":
            return self.expr
        if kind == "minmax":  # MinMaxNormalizer.java:47 (value-min)/(max-min)
            mn, mx = float(self.norm[1]), float(self.norm[2])
            return (self.expr - F.lit(mn)) / F.lit(mx - mn)
        if kind == "standard":  # StandardNormalizer.java:46 (value-avg)/std
            mu, sd = float(self.norm[1]), float(self.norm[2])
            return (self.expr - F.lit(mu)) / F.lit(sd)
        raise ValueError(f"unknown normalizer {kind!r}")


@dataclass
class LinearModel:
    """score = Σ weight_i · normalized(feature_i) (LinearModel.java:66-76)."""

    features: list[Feature]
    weights: dict[str, float]

    def score(self) -> Column:
        total = F.lit(0.0)
        for f in self.features:
            total = total + F.lit(float(self.weights.get(f.name, 0.0))) * f.normalized()
        return total


@dataclass
class TreeNode:
    """Regression-tree node (MultipleAdditiveTreesModel.RegressionTreeNode:
    a branch compares one feature against a threshold — missing/NaN goes
    left, matching the reference's `<=` left-branch convention — or a
    leaf holds a value)."""

    feature: str | None = None
    threshold: float = 0.0
    left: "TreeNode | None" = None
    right: "TreeNode | None" = None
    value: float = 0.0

    @property
    def is_leaf(self) -> bool:
        return self.feature is None


@dataclass
class TreesModel:
    """GBDT ensemble: score = Σ_tree weight_t · tree_t(features)
    (MultipleAdditiveTreesModel.java:60-140). Each tree folds to nested
    CASE WHEN over the feature Columns — pure Catalyst, evaluated only on
    the rerank head."""

    features: list[Feature]
    trees: list[tuple[float, TreeNode]] = field(default_factory=list)

    def _fold(self, node: TreeNode, cols: dict[str, Column]) -> Column:
        if node.is_leaf:
            return F.lit(float(node.value))
        fcol = cols[node.feature].cast("double")
        # missing (NULL) and NaN route LEFT — the reference's <=-left
        # convention (MultipleAdditiveTreesModel RegressionTreeNode)
        go_left = (
            fcol.isNull() | F.isnan(fcol) | (fcol <= F.lit(float(node.threshold)))
        )
        return F.when(go_left, self._fold(node.left, cols)).otherwise(
            self._fold(node.right, cols)
        )

    def score(self) -> Column:
        cols = {f.name: f.normalized() for f in self.features}
        total = F.lit(0.0)
        for w, root in self.trees:
            total = total + F.lit(float(w)) * self._fold(root, cols)
        return total


def _num(v) -> float:
    """Model-store numerics arrive as numbers or Java-float strings
    ('0.5f', '10.0f') — ManagedModelStore's parsed params."""
    if isinstance(v, str):
        return float(v.rstrip("fFdD"))
    return float(v)


def from_model_json(model_json: "str | dict", feature_exprs: dict[str, Column]):
    """Load a model from the reference's model-store JSON format
    (solr/modules/ltr/src/test-files/modelExamples/{linear-model,
    multipleadditivetreesmodel}.json; parser analog
    `modules/ltr/.../store/rest/ManagedModelStore.java`).

    ``feature_exprs`` maps each feature name to its Column expression —
    the stand-in for the feature store's query-derived features (feature
    extraction is engine-side; the model file only names them).
    Normalizer classes MinMaxNormalizer / StandardNormalizer /
    IdentityNormalizer map onto Feature.norm."""
    import json as _json

    spec = _json.loads(model_json) if isinstance(model_json, str) else model_json
    cls = spec["class"].rsplit(".", 1)[-1]
    feats = []
    for f in spec.get("features", []):
        name = f["name"]
        if name not in feature_exprs:
            raise KeyError(f"no Column expression provided for feature {name!r}")
        norm = ("identity",)
        n = f.get("norm")
        if n:
            ncls = n["class"].rsplit(".", 1)[-1]
            p = n.get("params", {})
            if ncls == "MinMaxNormalizer":
                norm = ("minmax", _num(p["min"]), _num(p["max"]))
            elif ncls == "StandardNormalizer":
                norm = ("standard", _num(p["avg"]), _num(p["std"]))
            elif ncls != "IdentityNormalizer":
                raise ValueError(f"unknown normalizer {ncls}")
        feats.append(Feature(name, feature_exprs[name], norm=norm))
    params = spec.get("params", {})
    if cls == "LinearModel":
        weights = {k: _num(v) for k, v in params.get("weights", {}).items()}
        return LinearModel(features=feats, weights=weights)
    if cls == "MultipleAdditiveTreesModel":

        def node(d: dict) -> TreeNode:
            if "value" in d:
                return TreeNode(value=_num(d["value"]))
            return TreeNode(
                feature=d["feature"],
                threshold=_num(d["threshold"]),
                left=node(d["left"]),
                right=node(d["right"]),
            )

        trees = [
            (_num(t.get("weight", 1.0)), node(t["root"]))
            for t in params.get("trees", [])
        ]
        return TreesModel(features=feats, trees=trees)
    raise ValueError(f"unsupported model class {spec['class']!r}")


def ltr_rerank(
    df: DataFrame,
    key_cols: list[str],
    main_order: list[Column],
    rerank_docs: int,
    model: "LinearModel | TreesModel",
    out_col: str = "ltr_score",
) -> DataFrame:
    """Re-score the top ``rerank_docs`` of the main ranking with ``model``;
    the tail keeps the original ``score`` column (LTRRescorer.java:149-235)
    — the shared windowed.rescore_head plan: TakeOrdered head, model
    Column on the head only, broadcast anti-join tail."""
    from ..operators.windowed import rescore_head

    return rescore_head(
        df.withColumn("score", F.col("score").cast("double")),
        key_cols,
        main_order,
        rerank_docs,
        model.score().cast("double"),
        out_col,
    )


@dataclass
class ExternalModel:
    """Opaque-model rescorer slot (the LTRRescorer.java:1 contract for
    models that do NOT fold into Catalyst columns — ONNX/XGBoost-style
    artifacts). ``predict_fn`` is any picklable callable
    (np.ndarray[n, n_features] float64) -> array[n] of scores; it ships
    to executors inside an Arrow-batched pandas UDF, so inference runs
    vectorized per batch — never per row.

    Feature extraction stays Catalyst (the same Feature/normalizer
    machinery as the folded models); only the final predict crosses into
    Python. Prefer LinearModel/TreesModel when the model IS expressible
    as columns — the JVM path wins — and this slot when it isn't."""

    features: list[Feature] = field(default_factory=list)
    predict_fn: "object" = None

    def score(self) -> Column:
        import numpy as np
        from pyspark.sql.functions import pandas_udf

        fn = self.predict_fn
        if fn is None:
            raise ValueError("ExternalModel needs a predict_fn")

        def _predict(*cols: pd.Series) -> pd.Series:
            X = (
                np.column_stack([c.to_numpy(dtype=np.float64) for c in cols])
                if cols
                else np.empty((0, 0))
            )
            return pd.Series(np.asarray(fn(X), dtype=np.float64))

        return pandas_udf(_predict, "double")(
            *[f.normalized() for f in self.features]
        )
