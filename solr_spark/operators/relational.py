"""Scan / project / filter / sort / top-k / paging operators.

Reference operators (all paths under /root/reference/solr/):
- search():  solrj-streaming/.../io/stream/SearchStream.java:1
- select():  solrj-streaming/.../io/stream/SelectStream.java:1
- sort():    solrj-streaming/.../io/stream/SortStream.java:1
- top():     solrj-streaming/.../io/stream/RankStream.java:47-59
- unique():  solrj-streaming/.../io/stream/UniqueStream.java:1
- merge():   solrj-streaming/.../io/stream/MergeStream.java:41-54
- having():  solrj-streaming/.../io/stream/HavingStream.java:1
- export sort: core/src/java/org/apache/solr/handler/export/ExportWriter.java:95
- cursorMark keyset paging: core/src/java/org/apache/solr/search/CursorMark.java:46-294
- /get point lookup: core/.../handler/component/RealTimeGetComponent.java:647

Every function is a declarative DataFrame plan — Catalyst handles
pushdown, pruning and TakeOrderedAndProject; nothing here materializes
on the driver. At 100 TB these plans scale because sorts are
range-partitioned shuffles and every top-k is partial-heap + merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def search(
    df: DataFrame,
    predicate: Column | str | None = None,
    fields: list[str | Column] | None = None,
    sort: list[Column] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """search(): filtered, projected, sorted scan (SearchStream.java:1).

    fq semantics: the predicate never affects scoring — it is a pure
    boolean filter (SolrIndexSearcher.java:1112-1139)."""
    out = df
    if predicate is not None:
        out = out.filter(predicate)
    if fields:
        out = out.select(*fields)
    if sort:
        out = out.orderBy(*sort)
    if limit is not None:
        out = out.limit(limit)
    return out


def select(df: DataFrame, *exprs: Column | str) -> DataFrame:
    """select(): projection / rename / per-tuple ops (SelectStream.java:1)."""
    return df.select(*exprs)


def having(df: DataFrame, predicate: Column) -> DataFrame:
    """having(): post-aggregation tuple filter (HavingStream.java:1)."""
    return df.filter(predicate)


def top(df: DataFrame, sort: list[Column], n: int) -> DataFrame:
    """top()/RankStream: bounded-priority-queue top-N (RankStream.java:54).

    Spark's TakeOrderedAndProject is the same algorithm distributed:
    per-partition heaps of size n, merged on the driver — identical to
    mergeIds' ShardFieldSortedHitQueue (QueryComponent.java:879-914)."""
    return df.orderBy(*sort).limit(n)


def export_sorted(df: DataFrame, keys: list[Column], fields: list[str]) -> DataFrame:
    """shuffle()/export(): full sorted result-set export
    (ExportWriter.java:367-389, per-segment merge :658-748).

    A total-order range-shuffle sort; at scale this is the one operator
    that legitimately shuffles everything, so project FIRST (docValues-
    only export — the reference never ships stored fields here either)."""
    return df.select(*fields).orderBy(*keys)


def global_rank(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global row_number over ``order`` WITHOUT a single-partition
    window — the distributed analog of the export handler's total-order
    rank (ExportWriter.java:367-389).

    Plan: range-shuffle on the sort keys + local sort (same exchange a
    global orderBy uses), one count-per-partition job, then a
    partition-local Arrow pass assigns rank = partition_offset + ordinal.
    Every stage is parallel; nothing funnels through one task.

    The sorted run is persisted (memory-and-disk) between the two passes:
    Spark's range partitioner seeds its boundary sampling with the RDD id,
    so re-executing the exchange in a second job could place rows in
    different partitions and corrupt the offsets. The cached run plays the
    role of the export handler's sorted segment files; callers that rank
    inside a larger pipeline should df.unpersist() when done."""
    import pandas as pd
    from pyspark import StorageLevel

    sess = df.sparkSession
    P = num_partitions or sess.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(P, *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
    ).persist(StorageLevel.MEMORY_AND_DISK)
    counts = {
        r["__pid"]: r["cnt"]
        for r in part.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql.types import StructType

    # copy before .add() — StructType.add mutates in place, and df.schema
    # is a cached object shared with the caller's DataFrame
    out_schema = StructType(list(df.schema.fields)).add(rank_col, "long")

    def kern(batches):
        local = 0
        for pdf in batches:
            if not len(pdf):
                continue
            base = offsets.get(int(pdf["__pid"].iloc[0]), 0)
            pdf = pdf.drop(columns="__pid")
            pdf[rank_col] = base + local + 1 + pd.RangeIndex(len(pdf))
            local += len(pdf)
            yield pdf

    out = part.mapInPandas(kern, out_schema)
    # hand the persisted run to callers that can release it after their
    # final materialization (nth_by_rank does; long pipelines should too)
    out._solr_spark_cached = part
    return out


def nth_by_rank(df: DataFrame, order: list[Column], ranks: list[int], value_col: str) -> DataFrame:
    """Exact order statistics: the rows at the given 1-based global ranks
    under ``order`` — two-pass selection (global_rank + filter), the exact
    percentile path (facet/PercentileAgg.java's t-digest is the sketch
    analog; this is the exact one). Returns (rank, value)."""
    ranked = global_rank(df, order, rank_col="__grank")
    rows = (
        ranked.filter(F.col("__grank").isin([int(r) for r in ranks]))
        .select(F.col("__grank").alias("rank"), F.col(value_col).alias("value"))
        .collect()  # len(ranks) rows — driver-side by construction
    )
    ranked._solr_spark_cached.unpersist()  # release the sorted run
    return df.sparkSession.createDataFrame(
        [(int(r["rank"]), r["value"]) for r in rows],
        f"rank bigint, value {df.schema[value_col].dataType.simpleString()}",
    )


def unique(df: DataFrame, keys: list[str], tiebreak: list[Column]) -> DataFrame:
    """unique(): one row per key, first by tiebreak order wins
    (UniqueStream.java:1 — 'first wins' over the sorted stream).

    dropDuplicates() is nondeterministic under parallelism; the
    reference's semantics require the sort-order head, so use a window."""
    w = Window.partitionBy(*keys).orderBy(*tiebreak)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_sorted(dfs: list[DataFrame], sort: list[Column]) -> DataFrame:
    """merge(): k-way merge of pre-sorted streams (MergeStream.java:41-54).
    In Spark a union is free (no shuffle) and the order is re-established
    by the downstream sort — Catalyst fuses them."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.orderBy(*sort)


def page(df: DataFrame, sort: list[Column], start: int, rows: int) -> DataFrame:
    """start/rows offset paging (SolrIndexSearcher.java:1537 getDocListC
    computes the superset). Plan: TakeOrdered over start+rows then an
    offset — per-partition heaps, no unpartitioned window funneling the
    whole table through one task. Deep paging degrades with start just
    like the reference; prefer cursor_page() for deep walks."""
    return df.orderBy(*sort).offset(start).limit(rows)


def cursor_page(
    df: DataFrame,
    sort_cols: list[tuple[str, bool]],
    after: tuple | None,
    rows: int,
) -> DataFrame:
    """cursorMark keyset pagination (CursorMark.java:46-294): the cursor
    totem is the last row's sort-key tuple; the next page is
    WHERE (sortkeys) > (totem) ORDER BY sortkeys LIMIT rows — stateless,
    constant cost per page at any depth (unlike offset paging).

    sort_cols: [(col, ascending)], must be a total order (the reference
    enforces uniqueKey as final tiebreak). after: last sort-key tuple of
    the previous page, or None for page 1.

    Sort-key columns must be NON-NULL: a NULL in the totem would null the
    keyset predicate and silently lose every later page, so a null totem
    value raises instead (the reference requires the uniqueKey + sort
    fields present for cursorMark for the same reason).
    """
    order = [F.col(c).asc() if asc else F.col(c).desc() for c, asc in sort_cols]
    out = df
    if after is not None:
        if any(v is None for v in after):
            raise ValueError(
                f"cursor totem {after!r} contains NULL — cursorMark sort "
                "keys must be non-null columns"
            )
        # lexicographic "row > totem" unrolled into OR-of-ANDs
        pred = F.lit(False)
        for i in range(len(sort_cols)):
            clause = F.lit(True)
            for j in range(i):
                clause = clause & (F.col(sort_cols[j][0]) == F.lit(after[j]))
            c, asc = sort_cols[i]
            cmp = F.col(c) > F.lit(after[i]) if asc else F.col(c) < F.lit(after[i])
            pred = pred | (clause & cmp)
        out = out.filter(pred)
    return out.orderBy(*order).limit(rows)


def realtime_get(df: DataFrame, key_col: str, keys: list, pending: DataFrame | None = None) -> DataFrame:
    """/get point lookup with uncommitted-batch overlay
    (RealTimeGetComponent.java:647-657 reads the tlog first, then the
    index). ``pending`` plays the tlog role: rows there shadow the
    committed table by key."""
    hit = df.filter(F.col(key_col).isin(keys))
    if pending is None:
        return hit
    fresh = pending.filter(F.col(key_col).isin(keys))
    shadowed = hit.join(fresh.select(key_col), key_col, "left_anti")
    return fresh.unionByName(shadowed)


def sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """random()/DeepRandomStream sampling (RandomStream.java:1) — seeded
    for reproducibility; Bernoulli per-partition, no shuffle."""
    return df.sample(fraction=fraction, seed=seed)
