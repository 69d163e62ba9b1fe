"""Operator-plane unit tests (streams/joins/windows), modeled on the
reference's StreamDecoratorTest tuple-level asserts
(/root/reference/solr/solrj-streaming/src/test/.../StreamDecoratorTest.java)
and CursorPagingTest's walk invariant
(/root/reference/solr/core/src/test/org/apache/solr/CursorPagingTest.java).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.operators import graph, joins, relational, rollup, windowed


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        (1, "a", 10.0), (2, "b", 20.0), (3, "a", 5.0), (4, "c", 20.0),
        (5, "b", 1.0), (6, None, 9.0), (7, "a", 10.0),
    ]
    return spark.createDataFrame(rows, "id int, grp string, score double")


def test_cursor_walk_equals_full_sort(spark, people):
    """cursorMark invariant: walking pages covers the full sorted order
    exactly once (CursorPagingTest)."""
    sort_cols = [("score", False), ("id", True)]
    full = [
        (r["id"])
        for r in people.orderBy(F.desc("score"), F.asc("id")).collect()
    ]
    walked, after = [], None
    for _ in range(10):
        page = relational.cursor_page(people, sort_cols, after, 3).collect()
        if not page:
            break
        walked += [r["id"] for r in page]
        after = (page[-1]["score"], page[-1]["id"])
    assert walked == full


def test_offset_page_matches_slice(spark, people):
    sort = [F.desc("score"), F.asc("id")]
    full = [r["id"] for r in people.orderBy(*sort).collect()]
    page = relational.page(people, sort, start=2, rows=3).collect()
    assert [r["id"] for r in page] == full[2:5]


def test_unique_first_wins(spark, people):
    out = relational.unique(people, ["grp"], [F.asc("score"), F.asc("id")])
    got = {r["grp"]: r["id"] for r in out.collect()}
    assert got == {"a": 3, "b": 5, "c": 4, None: 6}


def test_merge_sorted(spark, people):
    a = people.filter(F.col("id") <= 3)
    b = people.filter(F.col("id") > 3)
    merged = relational.merge_sorted([a, b], [F.asc("id")]).collect()
    assert [r["id"] for r in merged] == [1, 2, 3, 4, 5, 6, 7]


def test_realtime_get_overlay(spark, people):
    pending = spark.createDataFrame(
        [(2, "zz", 99.0)], "id int, grp string, score double"
    )
    out = relational.realtime_get(people, "id", [1, 2], pending)
    got = {r["id"]: r["grp"] for r in out.collect()}
    assert got == {1: "a", 2: "zz"}  # tlog row shadows committed row


def test_collapse_null_policies(spark, people):
    order = [F.desc("score"), F.asc("id")]
    ignore = windowed.collapse(people, "grp", order, "ignore").collect()
    assert {r["id"] for r in ignore} == {1, 2, 4}  # a->1 (10.0,id1), b->2, c->4
    expand = windowed.collapse(people, "grp", order, "expand").collect()
    assert {r["id"] for r in expand} == {1, 2, 4, 6}
    collapse_null = windowed.collapse(people, "grp", order, "collapse").collect()
    assert {r["id"] for r in collapse_null} == {1, 2, 4, 6}


def test_rerank(spark, people):
    df = people.withColumn("score", F.col("score"))
    out = windowed.rerank(
        df, ["id"], [F.desc("score"), F.asc("id")], rerank_docs=2,
        rescore=F.col("id").cast("double"), weight=1.0,
    )
    rows = {r["id"]: r["rerank_score"] for r in out.collect()}
    assert rows[2] == 22.0 and rows[4] == 24.0  # top-2 rescored
    assert rows[1] == 10.0  # tail keeps main score


def test_reduce_groups(spark, people):
    out = rollup.reduce_groups(
        people.filter(F.col("grp").isNotNull()),
        ["grp"], [F.asc("id")], ["id", "score"],
    ).collect()
    g = {r["grp"]: [x["id"] for x in r["group"]] for r in out}
    assert g == {"a": [1, 3, 7], "b": [2, 5], "c": [4]}


def test_graph_shortest_path(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "x")], "src string, dst string"
    )
    assert graph.shortest_path_frontier(edges, "src", "dst", "a", "d", 5) == 3
    assert graph.shortest_path_frontier(edges, "src", "dst", "a", "zz", 3) is None


def test_joins_matrix(spark, people):
    right = spark.createDataFrame([("a", 1), ("b", 2)], "grp string, v int")
    assert joins.intersect(people, right, ["grp"]).count() == 5
    assert joins.complement(people, right, ["grp"]).count() == 2  # c + null
    assert joins.hash_join(people, right, ["grp"]).count() == 5
    assert joins.left_outer_join(people, right, ["grp"]).count() == 7


def test_block_join_score_modes(spark):
    parents = spark.createDataFrame([(1, "p1"), (2, "p2")], "pid int, name string")
    children = spark.createDataFrame(
        [(1, 5.0), (1, 7.0), (2, 1.0)], "pid int, cs double"
    )
    out = joins.block_join_parents(
        parents, children, "pid", F.col("cs") > 0.0, F.col("cs"), "max"
    ).collect()
    assert {r["pid"]: r["child_score"] for r in out} == {1: 7.0, 2: 1.0}


def test_facet_sort_and_limit(spark, people):
    out = rollup.facet(people.filter(F.col("grp").isNotNull()), "grp", limit=2).collect()
    assert [(r["grp"], r["count"]) for r in out] == [("a", 3), ("b", 2)]


def test_percentiles_exact(spark, people):
    out = rollup.percentiles(people, "score", [0.5]).collect()[0]
    assert out["p50"] == 10.0  # exact interpolated median of 7 values


def test_global_rank_matches_window(spark, people):
    from solr_spark.operators import relational

    order = [F.desc("score"), F.asc("id")]
    got = relational.global_rank(people, order, num_partitions=3).collect()
    want = {
        r["id"]: i + 1
        for i, r in enumerate(people.orderBy(*order).collect())
    }
    assert {r["id"]: r["rank"] for r in got} == want


def test_nth_by_rank(spark, people):
    from solr_spark.operators import relational

    order = [F.asc("score"), F.asc("id")]
    out = relational.nth_by_rank(people, order, [1, 4], "score").collect()
    vals = {r["rank"]: r["value"] for r in out}
    ordered = [r["score"] for r in people.orderBy(*order).collect()]
    assert vals == {1: ordered[0], 4: ordered[3]}


def test_no_single_partition_exchange_in_rank_plans(spark):
    """The scale contract for the fixed round-1 offenders: global rank,
    exact percentile selection, and rerank must not funnel the table
    through one task (no Exchange SinglePartition in the physical plan).
    TakeOrderedAndProject (top-k heaps) is allowed."""
    from solr_spark.operators import relational, windowed

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("score")
    )
    plans = {
        "global_rank": relational.global_rank(df, [F.asc("score"), F.asc("id")]),
        "nth_by_rank": relational.nth_by_rank(
            df, [F.asc("score"), F.asc("id")], [500], "score"
        ),
        "rerank": windowed.rerank(
            df, ["id"], [F.desc("score"), F.asc("id")], 10,
            F.col("id").cast("double"), 1.0,
        ),
    }
    for name, d in plans.items():
        phys = d._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in phys, f"{name} plan funnels one task"


def test_graph_expand_max_fanout(spark):
    """Supernode guard: the hub node 'h' (degree 3 > cap 2) is reached
    but never expanded, so its neighbors stay unreachable."""
    from solr_spark.operators.graph import graph_expand

    edges = spark.createDataFrame(
        [("r", "h"), ("h", "a"), ("h", "b"), ("h", "c"), ("r", "x"), ("x", "y")],
        "src string, dst string",
    )
    roots = spark.createDataFrame([("r",)], "src string")
    uncapped = {
        (r["node"], r["depth"])
        for r in graph_expand(edges, "src", "dst", roots, 2).collect()
    }
    assert ("a", 2) in uncapped and ("y", 2) in uncapped
    capped = {
        (r["node"], r["depth"])
        for r in graph_expand(edges, "src", "dst", roots, 2, max_fanout=2).collect()
    }
    assert ("h", 1) in capped and ("y", 2) in capped  # reached, not expanded
    assert not any(n in ("a", "b", "c") for n, _ in capped)


def test_atomic_update_null_base_fields(spark):
    """Ops CREATE missing (NULL) fields instead of null-propagating —
    AtomicUpdateDocumentMerger semantics."""
    from solr_spark.operators.updates import atomic_update

    base = spark.createDataFrame(
        [(1, None, None), (2, 5.0, ["a"])],
        "id bigint, n double, tags array<string>",
    )
    upd = spark.createDataFrame(
        [(1, 2.0, "x"), (2, 1.0, "a")], "id bigint, n double, tags string"
    )
    out = {
        r["id"]: r
        for r in atomic_update(base, upd, "id", {"n": "inc", "tags": "add-distinct"}).collect()
    }
    assert out[1]["n"] == 2.0  # NULL base counts as 0
    assert out[1]["tags"] == ["x"]  # NULL base = empty array
    assert out[2]["n"] == 6.0
    assert out[2]["tags"] == ["a"]  # distinct: no duplicate append


def test_atomic_update_duplicate_keys_raise(spark):
    import pytest

    from solr_spark.operators.updates import atomic_update

    base = spark.createDataFrame([(1, 0.0)], "id bigint, n double")
    upd = spark.createDataFrame([(1, 1.0), (1, 2.0)], "id bigint, n double")
    with pytest.raises(ValueError, match="multiple rows"):
        atomic_update(base, upd, "id", {"n": "inc"})


def test_block_join_score_mode_none(spark):
    from pyspark.sql import functions as F

    from solr_spark.operators.joins import block_join_parents

    parents = spark.createDataFrame([(1,), (2,)], "pid bigint")
    children = spark.createDataFrame(
        [(1, 5.0), (1, 7.0)], "pid bigint, s double"
    )
    out = block_join_parents(
        parents, children, "pid", F.col("s") > 0,
        score_col=F.col("s"), score_mode="none",
    ).collect()
    assert [r["pid"] for r in out] == [1]
    assert "child_score" not in out[0].asDict()


def test_cursor_page_null_totem_raises(spark):
    import pytest

    from solr_spark.operators.relational import cursor_page

    df = spark.createDataFrame([(1, None)], "id bigint, ts timestamp")
    with pytest.raises(ValueError, match="NULL"):
        cursor_page(df, [("ts", True), ("id", True)], (None, 1), 10)


def test_page_no_single_partition_window(spark):
    from pyspark.sql import functions as F

    from solr_spark.operators.relational import page

    df = spark.createDataFrame([(i,) for i in range(100)], "v bigint")
    out = page(df, [F.asc("v")], start=10, rows=5)
    assert [r["v"] for r in out.collect()] == [10, 11, 12, 13, 14]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # TakeOrdered+offset, no window funnel


def test_facet_queries_edge_cases(spark):
    from pyspark.sql import functions as F

    from solr_spark.operators.rollup import facet_queries

    df = spark.createDataFrame([(1,), (2,), (3,)], "v bigint")
    assert facet_queries(df, {}).count() == 0
    out = {
        r["bucket"]: r["count"]
        for r in facet_queries(
            df, {"bob's `odd`": F.col("v") % 2 == 1, "big": F.col("v") > 2}
        ).collect()
    }
    assert out == {"bob's `odd`": 2, "big": 1}


def test_shortest_path_trivial(spark):
    from solr_spark.operators.graph import shortest_path_frontier

    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    assert shortest_path_frontier(edges, "src", "dst", "a", "a", 5) == 0


def test_atomic_update_removeregex(spark):
    from solr_spark.operators.updates import atomic_update

    base = spark.createDataFrame(
        [(1, ["alpha", "beta1", "beta2", "gamma"])], "id bigint, tags array<string>"
    )
    upd = spark.createDataFrame([(1, "^beta[0-9]$")], "id bigint, tags string")
    out = atomic_update(base, upd, "id", {"tags": "removeregex"}).collect()[0]
    assert out["tags"] == ["alpha", "gamma"]
