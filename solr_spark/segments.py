"""Incremental index maintenance: delta segments + live-docs deletes.

Mirrors the reference's update lifecycle — addDoc flushes new documents
into NEW segments while committed segments stay immutable, and deletes
are a docid mask applied at query time until a merge reclaims them
(/root/reference/solr/core/src/java/org/apache/solr/update/
DirectUpdateHandler2.java:309-409 addDoc -> segment flush;
update/UpdateLog.java:576-710 tlog replay; Lucene live-docs semantics:
deleted docs stop matching immediately, but df/doclen statistics keep
counting them until segments merge).

Spark shape: each delta batch is a full build_index run with a
bucket-aligned ``docid_base``, so a docid bucket never spans segments and
every per-(term,bucket) postings row lives in exactly one segment — the
query kernel needs no merge logic at all. The combined view is:

  postings    = union of segment postings dirs (one multi-path scan)
  terms       = groupBy(term).sum(df, cf) over segment term tables
                (exact global IDF across segments, the ExactStatsCache
                analog — stronger than Lucene's per-segment stats)
  docs        = union of segment docs dirs, minus the delete list
  n/avgdl     = summed totals (additions are append-only, so the
                combined stats equal a from-scratch rebuild's exactly —
                the invariant the gate entry u_incremental_index checks)

Deletes route queries down the per-row docs path (the packed
bucket_stats arrays are immutable snapshots), anti-joining the delete
keys — the live-docs bitmask as a join.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .indexer import IndexMeta, _done, build_index


@dataclass
class IndexView:
    """Queryable union of a base segment and any number of deltas."""

    segments: list[IndexMeta]
    delete_keys: list[tuple] = field(default_factory=list)  # id_cols tuples

    @property
    def bucket_docs(self) -> int:
        return self.segments[0].bucket_docs

    @property
    def id_cols(self) -> list:
        # the composite unique key every segment was built with (delta
        # segments inherit it via add_segment, so segment 0 is canonical)
        return list(self.segments[0].id_cols)

    def _delete_frame(self, spark: SparkSession):
        ids = self.id_cols
        return spark.createDataFrame(
            self.delete_keys, ", ".join(f"{c} string" for c in ids)
        )

    @property
    def n_docs(self) -> int:
        # live-docs semantics: stats keep counting deleted docs (they are
        # masked from matching, not from the statistics) — Lucene parity
        return sum(m.n_docs for m in self.segments)

    @property
    def sum_doclen(self) -> int:
        return sum(m.sum_doclen for m in self.segments)

    @property
    def avgdl(self) -> float:
        return self.sum_doclen / self.n_docs if self.n_docs else 0.0

    @property
    def next_docid_base(self) -> int:
        last = self.segments[-1]
        end = last.docid_base + last.n_docs
        b = self.bucket_docs
        return ((end + b - 1) // b) * b

    def frames(self, spark: SparkSession):
        """(terms, postings, docs, bucket_stats) frames for kernel.search.

        With deletes present, bucket_stats is None (forces the per-row
        docs path where the anti-join mask applies)."""
        terms = (
            spark.read.parquet(*[m.terms_path for m in self.segments])
            .groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        )
        postings = spark.read.parquet(*[m.postings_path for m in self.segments])
        docs = spark.read.parquet(*[m.docs_path for m in self.segments])
        bstats = None
        if self.delete_keys:
            docs = docs.join(
                F.broadcast(self._delete_frame(spark)), self.id_cols,
                "left_anti",
            )
        else:
            bs_paths = [
                m.bucket_stats_path
                for m in self.segments
                if _done(m.bucket_stats_path)
            ]
            if len(bs_paths) == len(self.segments):
                bstats = spark.read.parquet(*bs_paths)
        return terms, postings, docs, bstats

    def search(
        self,
        spark: SparkSession,
        q,
        k: int = 10,
        prune: bool = True,
        unsorted: bool = False,
    ) -> DataFrame:
        from .kernel import search

        return search(
            spark, self, q, k=k, prune=prune, unsorted=unsorted,
            _frames=self.frames(spark),
        )

    # kernel.search duck-types these off IndexMeta
    @property
    def docs_path(self) -> str:  # pragma: no cover - only hit without _frames
        raise AttributeError("IndexView is multi-segment; use frames()")


def open_base(spark: SparkSession, docs: DataFrame, out_dir: str, **kw) -> IndexView:
    """Build (or resume) the base segment and wrap it in a view."""
    meta = build_index(spark, docs, os.path.join(out_dir, "seg_0"), **kw)
    return IndexView(segments=[meta])


def add_segment(
    spark: SparkSession, view: IndexView, new_docs: DataFrame, out_dir: str, **kw
) -> IndexView:
    """Flush a batch of new documents as the next immutable delta segment
    (DirectUpdateHandler2.addDoc -> flush). The new segment's docids start
    at the next bucket boundary, so buckets never straddle segments."""
    seg_id = len(view.segments)
    base = view.segments[0]
    # deltas inherit the base segment's analysis config — a delta built
    # with a different analyzer/bigram setting would be silently
    # inconsistent with the shared dictionary
    kw.setdefault("analyzer", base.analyzer)
    kw.setdefault("bigrams", base.has_bigrams)
    kw.setdefault("synonyms", getattr(base, "synonyms", None))
    meta = build_index(
        spark,
        new_docs,
        os.path.join(out_dir, f"seg_{seg_id}"),
        bucket_docs=view.bucket_docs,
        docid_base=view.next_docid_base,
        **kw,
    )
    return IndexView(segments=view.segments + [meta], delete_keys=view.delete_keys)


def merge_segments(
    spark: SparkSession, view: IndexView, out_dir: str, num_partitions: int | None = None
) -> IndexView:
    """Merge all segments (and reclaim deletes) into ONE new segment —
    the background merge of the reference lifecycle
    (update/DirectUpdateHandler2.java segment merging via Lucene
    TieredMergePolicy; Lucene merge semantics: deleted docs disappear
    from postings AND statistics once merged away).

    Pure postings-level merge — content is never re-read or re-analyzed
    (exactly like Lucene, which merges inverted files directly):

      1. live docs = union of segment docs minus the delete mask;
         new docid = dense ordinal of the (repo, path, commit) sort
         (the same determinism contract as a fresh build)
      2. postings decode → (term, old docid, tf, doclen) triples →
         broadcast-free remap join on old docid → re-encode under the
         new bucket layout (one range exchange on (term, bucket))
      3. doc/bucket/term stats recomputed from the merged rows

    The result is bit-identical to a from-scratch rebuild over the live
    documents (tests/test_invariance.py pins this), at a fraction of the
    cost: no tokenization, no content scan."""
    from .indexer import (
        POSTINGS_SCHEMA,
        IndexMeta,
        _encode_partition_arrow,
        write_bucket_stats,
        write_term_stats,
    )
    from .kernel import decode_posting_frame
    from .operators.relational import global_rank

    P = num_partitions or spark.sparkContext.defaultParallelism
    bucket_docs = view.bucket_docs
    os.makedirs(out_dir, exist_ok=True)

    ids = view.id_cols
    docs = spark.read.parquet(*[m.docs_path for m in view.segments])
    if view.delete_keys:
        docs = docs.join(
            F.broadcast(view._delete_frame(spark)), ids, "left_anti"
        )

    # 1. dense new docids in id_cols order — the fresh-build docid
    # contract, so merged == rebuilt exactly
    ranked = global_rank(
        docs.select("docid", *ids, "lang", "sha256", "doclen"),
        [F.asc(c) for c in ids],
    )
    remap = ranked.select(
        F.col("docid").alias("old_docid"),
        (F.col("rank") - 1).alias("docid"),
        *ids, "lang", "sha256", "doclen",
    )

    new_docs = remap.select(
        "docid",
        F.expr(f"docid DIV {bucket_docs}").alias("bucket"),
        *ids, "lang", "sha256", "doclen",
    )
    docs_out = os.path.join(out_dir, "docs")
    (
        new_docs.repartitionByRange(max(P // 2, 1), "docid")
        .sortWithinPartitions("docid")
        .write.mode("overwrite")
        .parquet(docs_out)
    )
    new_docs = spark.read.parquet(docs_out)
    n_docs = new_docs.count()
    sum_doclen = int(
        new_docs.agg(F.sum("doclen").alias("s")).collect()[0]["s"] or 0
    )

    # 2. postings: decode old rows to triples, remap docids, re-encode
    # (decode_posting_frame is the same kernel the function-query surface
    # uses — one decode loop shared across the codebase)
    postings = spark.read.parquet(*[m.postings_path for m in view.segments])
    triples = decode_posting_frame(postings, bucket_docs).withColumnRenamed(
        "docid", "old_docid"
    )
    remap_small = remap.select("old_docid", "docid", "doclen")
    merged = (
        triples.join(remap_small, "old_docid")  # deleted docids drop out here
        .select(
            "term",
            "docid",
            "tf",
            "doclen",
            F.expr(f"docid DIV {bucket_docs}").alias("bucket"),
        )
    )
    post_out = os.path.join(out_dir, "postings")
    (
        merged.repartitionByRange(P, "term", "bucket")
        .sortWithinPartitions("term", "bucket", "docid")
        .mapInArrow(_encode_partition_arrow(bucket_docs), POSTINGS_SCHEMA)
        .write.mode("overwrite")
        .parquet(post_out)
    )
    new_postings = spark.read.parquet(post_out)

    # the ranked run's cache served both the docs write and the postings
    # remap join — release it before the (cheap) stats passes
    ranked._solr_spark_cached.unpersist()

    # 3. stats tables — the SAME writers build_index uses (stages 2b/4),
    # so the layouts cannot desynchronize
    bs_out = os.path.join(out_dir, "bucket_stats")
    write_bucket_stats(new_docs, bs_out, P, first_id_col=ids[0])
    terms_out = os.path.join(out_dir, "terms")
    write_term_stats(new_postings, terms_out, P)

    meta = IndexMeta(
        out_dir=out_dir,
        n_docs=n_docs,
        sum_doclen=sum_doclen,
        avgdl=sum_doclen / n_docs if n_docs else 0.0,
        bucket_docs=bucket_docs,
        analyzer=view.segments[0].analyzer,
        synonyms=getattr(view.segments[0], "synonyms", None),
        has_bigrams=all(m.has_bigrams for m in view.segments),
        id_cols=ids,
    )
    ts = spark.read.parquet(terms_out).agg(
        F.count("*").alias("n_terms"), F.max("df").alias("max_df"),
        F.avg("df").alias("mean_df"),
    ).collect()[0]
    meta.n_terms = int(ts["n_terms"] or 0)
    meta.skew_max_df = int(ts["max_df"] or 0)
    meta.skew_ratio = float(ts["max_df"] / ts["mean_df"]) if ts["mean_df"] else 0.0
    meta.save()
    return IndexView(segments=[meta])


def save_view(view: IndexView, out_dir: str, batch_ids: list[int] | None = None) -> None:
    """Persist the segment manifest (the commit point of the incremental
    lifecycle — the analog of Lucene's segments_N file). ``batch_ids``
    records which streaming micro-batches produced which segment, making
    foreachBatch replay idempotent (see streaming.stream_index)."""
    import json

    manifest = {
        "segments": [m.out_dir for m in view.segments],
        "delete_keys": [list(k) for k in view.delete_keys],
        "batch_ids": batch_ids or [],
    }
    tmp = os.path.join(out_dir, "view_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "view_manifest.json"))


def load_view(out_dir: str) -> "tuple[IndexView, list[int]] | None":
    """Load (view, batch_ids) from the manifest, or None if absent."""
    import json

    path = os.path.join(out_dir, "view_manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        m = json.load(f)
    view = IndexView(
        segments=[IndexMeta.load(p) for p in m["segments"]],
        delete_keys=[tuple(k) for k in m["delete_keys"]],
    )
    return view, list(m.get("batch_ids", []))


def delete_by_keys(view: IndexView, keys: list[tuple]) -> IndexView:
    """Mark composite-key (view.id_cols) tuples deleted — the live-docs mask
    (deleteByQuery/deleteById in DirectUpdateHandler2.java:409; applied at
    query time, reclaimed only by a future merge/rebuild)."""
    return IndexView(
        segments=view.segments, delete_keys=view.delete_keys + list(keys)
    )
