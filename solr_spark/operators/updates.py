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
      'inc'          — numeric increment
      'add'          — append to array field
      'add-distinct' — append if absent
      'remove'       — remove matching values from array field
    """
    upd_cols = {c: f"__u_{c}" for c in ops}
    u = updates.select(
        key, *[F.col(c).alias(a) for c, a in upd_cols.items()]
    )
    out = base.join(u, key, "left")
    for c, op in ops.items():
        uc = F.col(upd_cols[c])
        old = F.col(c)
        if op == "set":
            new = F.coalesce(uc, old)
        elif op == "inc":
            new = F.when(uc.isNotNull(), old + uc).otherwise(old)
        elif op == "add":
            new = F.when(uc.isNotNull(), F.concat(old, F.array(uc))).otherwise(old)
        elif op == "add-distinct":
            new = F.when(
                uc.isNotNull() & ~F.array_contains(old, uc),
                F.concat(old, F.array(uc)),
            ).otherwise(old)
        elif op == "remove":
            new = F.when(uc.isNotNull(), F.array_remove(old, uc)).otherwise(old)
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
