"""Window-function operators: collapse / expand / grouping / dedup heads.

Reference (paths under /root/reference/solr/):
- collapse: core/.../search/CollapsingQParserPlugin.java:111-191 (3,810 LoC
  — the reference's largest single operator: keep one "group head" per
  collapse-field value, selected by score/min/max/sort; nullPolicy
  ignore/expand/collapse)
- expand:   core/.../handler/component/ExpandComponent.java:108 (fetch the
  collapsed-away group members for the current page)
- grouping (group=true, top-N per group, two-phase distributed):
  core/.../search/Grouping.java:76-181

All map to Window.partitionBy + row_number — Spark's window exchange is
hash-partitioned on the group field, which is exactly the reference's
per-shard collapse + coordinator merge, minus the approximation the
reference suffers when a group spans shards (we are exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def collapse(
    df: DataFrame,
    field: str,
    order: list[Column],
    null_policy: str = "ignore",
) -> DataFrame:
    """collapse: one head row per ``field`` value, head = first row under
    ``order`` (CollapsingQParserPlugin.java:111-191 group-head selection).

    null_policy (CollapsingQParserPlugin NullPolicy):
      - 'ignore': drop rows with null collapse key
      - 'expand': keep every null-key row as its own group
      - 'collapse': all null-key rows form one group
    """
    if null_policy == "ignore":
        df = df.filter(F.col(field).isNotNull())
        part = [F.col(field)]
    elif null_policy == "expand":
        df = df.withColumn(
            "__cgrp",
            F.when(F.col(field).isNull(), F.monotonically_increasing_id().cast("string"))
            .otherwise(F.col(field).cast("string")),
        )
        part = [F.col("__cgrp")]
    elif null_policy == "collapse":
        part = [F.coalesce(F.col(field).cast("string"), F.lit("__null__"))]
    else:
        raise ValueError(f"unknown nullPolicy {null_policy!r}")
    w = Window.partitionBy(*part).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    return out.drop("__cgrp") if null_policy == "expand" else out


def expand(
    collapsed_page: DataFrame,
    full: DataFrame,
    field: str,
    order: list[Column],
    expand_rows: int = 5,
) -> DataFrame:
    """expand: for each group key present on the collapsed page, return up
    to ``expand_rows`` of the *other* members of that group
    (ExpandComponent.java:108). Keys are a page-sized set → broadcast."""
    keys = collapsed_page.select(field).dropDuplicates([field])
    heads = collapsed_page.select(F.col(field).alias("__f"), *[])
    members = full.join(F.broadcast(keys), field, "left_semi")
    w = Window.partitionBy(field).orderBy(*order)
    ranked = members.withColumn("__rn", F.row_number().over(w))
    # rank 1 is the head shown on the page; expand returns ranks 2..n+1
    return (
        ranked.filter((F.col("__rn") > 1) & (F.col("__rn") <= expand_rows + 1))
        .drop("__rn")
    )


def group_top_n(df: DataFrame, group_field: str, order: list[Column], n: int) -> DataFrame:
    """grouping (group=true&group.limit=n): top-N rows per group value
    (Grouping.java:76-181; distributed two-phase STAGE_TOP_GROUPS merge at
    QueryComponent.java:108-110 — Spark's window shuffle is one exact
    phase)."""
    w = Window.partitionBy(group_field).orderBy(*order)
    return df.withColumn("group_rank", F.row_number().over(w)).filter(
        F.col("group_rank") <= n
    )


def elevate(
    df: DataFrame,
    key_col: str,
    elevated_keys: list,
    order: list[Column],
    k: int,
) -> DataFrame:
    """Query elevation: pin the configured docs to the top of the result
    page, in their configured order, organic ranking after
    (handler/component/QueryElevationComponent.java:1 — elevate.xml's
    per-query doc pinning).

    Composite sort = (elevation position if pinned else ∞, main order);
    the page rank comes from the distributed partition-offset global_rank
    (no unpartitioned window). Returns the top ``k`` rows with a 1-based
    ``pos`` column."""
    from .relational import global_rank

    spark = df.sparkSession
    key_type = df.schema[key_col].dataType.simpleString()
    ev = spark.createDataFrame(
        [(kk, i) for i, kk in enumerate(elevated_keys)],
        f"{key_col} {key_type}, __elev_pos int",
    )
    j = df.join(F.broadcast(ev), key_col, "left")
    sort_first = F.asc(F.coalesce(F.col("__elev_pos"), F.lit(2**31 - 1)))
    ranked = global_rank(j, [sort_first, *order])
    return (
        ranked.filter(F.col("rank") <= k)
        .withColumn("pos", F.col("rank").cast("int"))
        .drop("rank", "__elev_pos")
    )


def rescore_head(
    df: DataFrame,
    key_cols: list[str],
    main_order: list[Column],
    n: int,
    head_score: Column,
    out_col: str,
) -> DataFrame:
    """Shared head-rescore plan (rerank and LTR both ride it): the head
    is TakeOrdered (per-partition heaps of size ``n``, no global window),
    ``head_score`` evaluates only on those ``n`` rows, and the tail is a
    broadcast anti-join against the tiny head key set keeping the
    original ``score`` — the full table is never globally sorted through
    one task.

    ``key_cols`` are appended to the sort so head selection is a TOTAL
    order: the head expression is evaluated twice (rescore + anti-join)
    and two TakeOrdered runs may pick different tied rows under a
    partial order — a row would then duplicate or vanish."""
    total_order = [*main_order, *[F.asc(c) for c in key_cols]]
    head = df.orderBy(*total_order).limit(n)
    head_scored = head.withColumn(out_col, head_score)
    tail = df.join(
        F.broadcast(head.select(*key_cols)), key_cols, "left_anti"
    ).withColumn(out_col, F.col("score"))
    return head_scored.unionByName(tail)


def rerank(
    df: DataFrame,
    key_cols: list[str],
    main_order: list[Column],
    rerank_docs: int,
    rescore: Column,
    weight: float = 2.0,
) -> DataFrame:
    """rerank: re-score the top ``rerank_docs`` of the main ranking by
    ``main_score + weight * rescore``, leave the tail at the main score
    (ReRankQParserPlugin.java:34-79, ReRankCollector.java:1).

    df must carry a ``score`` column (the main query score); ``key_cols``
    uniquely identify a row (the uniqueKey — same requirement as the
    reference's docid-keyed ReRankCollector). Plan shape: rescore_head."""
    return rescore_head(
        df,
        key_cols,
        main_order,
        rerank_docs,
        F.col("score") + F.lit(weight) * rescore,
        "rerank_score",
    )
