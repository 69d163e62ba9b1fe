"""Join operators — dataflow-plane tuple joins + index-plane domain joins.

Reference operators (paths under /root/reference/solr/):
- innerJoin():        solrj-streaming/.../io/stream/InnerJoinStream.java:1
                      (sort-merge; base JoinStream.java:1)
- leftOuterJoin():    solrj-streaming/.../io/stream/LeftOuterJoinStream.java:1
- hashJoin():         solrj-streaming/.../io/stream/HashJoinStream.java:1
                      (build hash map on 'hashed' input, probe the stream)
- outerHashJoin():    solrj-streaming/.../io/stream/OuterHashJoinStream.java:1
- intersect():        solrj-streaming/.../io/stream/IntersectStream.java:1 (semi)
- complement():       solrj-streaming/.../io/stream/ComplementStream.java:1 (anti)
- fetch():            solrj-streaming/.../io/stream/FetchStream.java:1
- cartesianProduct(): solrj-streaming/.../io/stream/CartesianProductStream.java:1
                      (an UNNEST over a multivalued field, not a cross join)
- {!join} domain change: core/.../search/JoinQParserPlugin.java:36-110
- {!parent}/{!child} block join:
  core/.../search/join/BlockJoinParentQParser.java:1

The reference only has equi-joins (eq field equalitors, SURVEY.md §2.4).
Catalyst picks SMJ vs broadcast-hash per stats; `hash_join` forces the
broadcast build side exactly like the reference's explicit `hashed` input.
At 100 TB: dimension sides get broadcast(), fact-fact joins shuffle on the
key — AQE handles skewed keys (skewJoin.enabled in session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def inner_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """innerJoin(): sort-merge equi-join (InnerJoinStream.java:1). The
    reference requires both inputs pre-sorted on the key; Spark's SMJ
    performs that sort as a key-partitioned shuffle."""
    return left.join(right, on, "inner")


def left_outer_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """leftOuterJoin() (LeftOuterJoinStream.java:1)."""
    return left.join(right, on, "left_outer")


def hash_join(stream: DataFrame, hashed: DataFrame, on: list[str], how: str = "inner") -> DataFrame:
    """hashJoin()/outerHashJoin(): build side explicitly hashed
    (HashJoinStream.java:1) → Spark broadcast-hash join. Use when the
    build side fits in executor memory (dimension tables)."""
    return stream.join(F.broadcast(hashed), on, how)


def intersect(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """intersect(): keep left tuples whose key exists in right — a
    LEFT SEMI join, not a full-row set-intersect (IntersectStream.java:1)."""
    return left.join(right.select(*on).dropDuplicates(on), on, "left_semi")


def complement(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """complement(): left tuples with no key in right — LEFT ANTI
    (ComplementStream.java:1)."""
    return left.join(right.select(*on).dropDuplicates(on), on, "left_anti")


def fetch(stream: DataFrame, lookup: DataFrame, key: str, fields: list[str]) -> DataFrame:
    """fetch(): batched lookup-join enrichment by key (FetchStream.java:1).
    The reference fetches in batches over HTTP; Spark broadcasts the
    projected lookup side so the probe stays map-side."""
    side = lookup.select(key, *fields)
    return stream.join(F.broadcast(side), key, "left_outer")


def cartesian_product(df: DataFrame, array_col: Column | str, out_name: str) -> DataFrame:
    """cartesianProduct(): one tuple per element of a multivalued field
    (CartesianProductStream.java:1) — exactly explode()/UNNEST."""
    col = F.col(array_col) if isinstance(array_col, str) else array_col
    return df.withColumn(out_name, F.explode(col))


def join_domain(
    to_df: DataFrame, to_field: str, from_df: DataFrame, from_field: str
) -> DataFrame:
    """{!join from=f to=t}: semi-join domain change — docs whose ``to``
    field matches any ``from`` value of the subquery's matches
    (JoinQParserPlugin.java:36-110, JoinQuery.java:1). Never widens rows."""
    keys = from_df.select(F.col(from_field).alias(to_field)).dropDuplicates([to_field])
    return to_df.join(keys, to_field, "left_semi")


def block_join_parents(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_filter: Column,
    score_col: Column | None = None,
    score_mode: str = "avg",
) -> DataFrame:
    """{!parent which=...}: map child matches → parent docs, with
    ScoreMode avg/max/total/min/none over child scores
    (BlockJoinParentQParser.java:1, facet/BlockJoin.java:1).

    The reference uses contiguous doc blocks; the relational equivalent
    is child groupBy(parent_key) + join — same result, shuffle on the
    parent key."""
    hits = children.filter(child_filter)
    if score_col is None or score_mode == "none":
        keys = hits.select(parent_key).dropDuplicates([parent_key])
        return parents.join(keys, parent_key, "left_semi")
    aggs = {
        "avg": F.avg(score_col),
        "max": F.max(score_col),
        "total": F.sum(score_col),
        "min": F.min(score_col),
    }
    if score_mode not in aggs:
        raise ValueError(
            f"unknown score_mode {score_mode!r}; one of "
            f"{sorted(aggs) + ['none']}"
        )
    agg = aggs[score_mode].alias("child_score")
    scores = hits.groupBy(parent_key).agg(agg)
    return parents.join(scores, parent_key, "inner")


def block_join_children(
    parents: DataFrame, children: DataFrame, parent_key: str, parent_filter: Column
) -> DataFrame:
    """{!child of=...}: parents matching → their children
    (BlockJoinChildQParser.java:1)."""
    keys = parents.filter(parent_filter).select(parent_key).dropDuplicates([parent_key])
    return children.join(keys, parent_key, "left_semi")
