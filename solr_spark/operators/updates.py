"""Document-update operators: atomic field updates + delete-by-key.

Reference (/root/reference/solr/):
- atomic updates (set/add/remove/removeregex/inc/add-distinct):
  core/.../update/processor/AtomicUpdateDocumentMerger.java:164-196
- delete-by-id / delete-by-query: solrj-streaming/.../io/stream/DeleteStream.java:1,
  core/.../update/DirectUpdateHandler2.java (deleteByQuery)

Spark mapping: copy-on-write MERGE semantics — a left join of the base
table with the updates keyed by uniqueKey, per-column combinators, and an
atomic directory swap for the commit (sources.write_commit). This is the
Iceberg MERGE INTO shape expressed with plain DataFrame ops so it runs on
any table format.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def atomic_update(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    ops: dict[str, str],
) -> DataFrame:
    """Apply atomic update ops to matching rows; non-matching rows pass
    through unchanged (AtomicUpdateDocumentMerger semantics).

    ``updates`` carries ``key`` plus one column per updated field, named
    like the base column. ``ops`` maps column → one of:
      'set'          — replace value (null update = keep old, matching
                       Solr's 'set null removes field' nuance is left to
                       the caller via an explicit sentinel)
      'inc'          — numeric increment (a NULL base counts as 0 —
                       Solr creates the missing field)
      'add'          — append to array field (NULL base = empty array)
      'add-distinct' — append if absent (NULL base = empty array)
      'remove'       — remove matching values from array field
      'removeregex'  — remove array values matching the update's regex

    ``updates`` must carry at most ONE row per key (the reference applies
    queued updates sequentially; a fanned-out join would duplicate base
    rows) — validated with one tiny aggregation over the updates frame.
    """
    upd_cols = {c: f"__u_{c}" for c in ops}
    dup = (
        updates.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"updates frame has multiple rows for key {dup[0][key]!r}; "
            "collapse queued updates to one row per key first"
        )
    u = updates.select(
        key, *[F.col(c).alias(a) for c, a in upd_cols.items()]
    )
    out = base.join(u, key, "left")
    for c, op in ops.items():
        uc = F.col(upd_cols[c])
        old = F.col(c)
        # a NULL base field is "missing" — ops CREATE it, matching
        # AtomicUpdateDocumentMerger (a null-propagating expression would
        # silently drop the update instead)
        empty_arr = F.array().cast(f"array<{updates.schema[c].dataType.simpleString()}>")
        old_arr = F.coalesce(old, empty_arr)
        if op == "set":
            new = F.coalesce(uc, old)
        elif op == "inc":
            new = F.when(uc.isNotNull(), F.coalesce(old, F.lit(0)) + uc).otherwise(old)
        elif op == "add":
            new = F.when(uc.isNotNull(), F.concat(old_arr, F.array(uc))).otherwise(old)
        elif op == "add-distinct":
            new = F.when(
                uc.isNotNull() & ~F.coalesce(F.array_contains(old_arr, uc), F.lit(False)),
                F.concat(old_arr, F.array(uc)),
            ).otherwise(old)
        elif op == "remove":
            new = F.when(uc.isNotNull(), F.array_remove(old_arr, uc)).otherwise(old)
        elif op == "removeregex":
            new = F.when(
                uc.isNotNull(),
                F.filter(old_arr, lambda v: ~F.regexp_like(v, uc)),
            ).otherwise(old)
        else:
            raise ValueError(f"unknown atomic op {op!r}")
        out = out.withColumn(c, new)
    return out.drop(*upd_cols.values())


def delete_by_key(base: DataFrame, keys: DataFrame, key: str) -> DataFrame:
    """delete-by-id: drop rows whose key appears in ``keys``
    (DeleteStream.java:1) — an anti-join; commit via sources.write_commit."""
    return base.join(keys.select(key).dropDuplicates([key]), key, "left_anti")


def delete_by_query(base: DataFrame, predicate: Column) -> DataFrame:
    """delete-by-query: drop rows matching the predicate
    (DirectUpdateHandler2.deleteByQuery)."""
    return base.filter(~predicate)
