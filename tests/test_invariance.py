"""Differential tests: the reference's control-vs-distributed pattern
(BaseDistributedSearchTestCase.compareResponses) plus checkpoint/resume
(UpdateLog replay semantics). See FIXTURES.md §4."""

import os
import shutil

from pyspark.sql import functions as F

from solr_spark.indexer import build_index
from solr_spark.kernel import search


def _postings_fingerprint(spark, meta):
    return (
        spark.read.parquet(meta.postings_path)
        .select(
            "term", "bucket", "df", "cf",
            F.sha2(F.col("doc_bytes"), 256).alias("dh"),
            F.sha2(F.col("tf_bytes"), 256).alias("th"),
        )
        .orderBy("term", "bucket")
        .toPandas()
    )


def test_parallelism_invariance(spark, small_corpus, small_index, tmp_path):
    """Index built at 2 partitions == index built at 4 partitions:
    identical docids, identical encoded postings bytes, identical top-k."""
    out2 = str(tmp_path / "idx2")
    meta2 = build_index(
        spark, spark.read.parquet(small_corpus), out2, bucket_docs=256, num_partitions=2
    )
    assert meta2.n_docs == small_index.n_docs
    assert meta2.avgdl == small_index.avgdl

    a = _postings_fingerprint(spark, small_index)
    b = _postings_fingerprint(spark, meta2)
    assert len(a) == len(b)
    assert (a.to_numpy() == b.to_numpy()).all()

    for q in ["license", "+int +license", "getFooBar license"]:
        ra = [(r["docid"], r["score"]) for r in search(spark, small_index, q, k=10).collect()]
        rb = [(r["docid"], r["score"]) for r in search(spark, meta2, q, k=10).collect()]
        assert ra == rb


def test_resume_skips_completed_stages(spark, small_corpus, small_index, tmp_path):
    """Kill-and-rerun: completed stages are not recomputed (mtime proof),
    missing stages are rebuilt, final index identical."""
    out = str(tmp_path / "idx_resume")
    shutil.copytree(small_index.out_dir, out)
    # simulate a crash after the postings stage: meta + term_stats missing
    os.remove(os.path.join(out, "meta.json"))
    shutil.rmtree(os.path.join(out, "terms"))
    post_marker = os.path.join(out, "postings", "_SUCCESS")
    stage_marker = os.path.join(out, "_stage", "tokens", "_SUCCESS")
    m_post, m_stage = os.path.getmtime(post_marker), os.path.getmtime(stage_marker)

    meta = build_index(
        spark, spark.read.parquet(small_corpus), out, bucket_docs=256, num_partitions=4
    )
    assert os.path.getmtime(post_marker) == m_post      # not recomputed
    assert os.path.getmtime(stage_marker) == m_stage    # not recomputed
    assert os.path.exists(os.path.join(out, "terms", "_SUCCESS"))  # rebuilt
    assert meta.n_docs == small_index.n_docs
    assert meta.postings_bytes == small_index.postings_bytes

    ra = [(r["docid"], r["score"]) for r in search(spark, small_index, "license", k=5).collect()]
    rb = [(r["docid"], r["score"]) for r in search(spark, meta, "license", k=5).collect()]
    assert ra == rb


def test_resume_noop_when_complete(spark, small_corpus, small_index):
    """A finished index returns instantly from meta.json."""
    meta = build_index(
        spark, spark.read.parquet(small_corpus), small_index.out_dir,
        bucket_docs=256, num_partitions=4,
    )
    assert meta.n_docs == small_index.n_docs
    assert meta.stages == small_index.stages


def test_incremental_segments_equal_full_rebuild(spark, small_corpus, tmp_path_factory):
    """base + delta segments answer queries identically to a from-scratch
    rebuild (append-only: combined N/avgdl/df equal the full build's) —
    the DirectUpdateHandler2 addDoc->flush lifecycle as immutable delta
    segments; then live-docs delete semantics: deleted docs stop matching,
    surviving docs keep their exact scores (Lucene keeps deleted docs in
    the statistics until merge)."""
    from pyspark.sql import functions as F

    from solr_spark.indexer import build_index
    from solr_spark.kernel import search
    from solr_spark.segments import add_segment, delete_by_keys, open_base

    docs = spark.read.parquet(small_corpus)
    full_dir = str(tmp_path_factory.mktemp("segfull") / "idx")
    full = build_index(spark, docs, full_dir, bucket_docs=128, num_partitions=4)

    seg_dir = str(tmp_path_factory.mktemp("segview") / "view")
    cut = docs.select("repo").distinct().orderBy("repo").collect()
    mid = cut[len(cut) // 2]["repo"]
    view = open_base(
        spark, docs.filter(F.col("repo") < mid), seg_dir,
        bucket_docs=128, num_partitions=4,
    )
    view = add_segment(
        spark, view, docs.filter(F.col("repo") >= mid), seg_dir, num_partitions=4
    )
    assert view.n_docs == full.n_docs and view.avgdl == full.avgdl

    for q in ["license", "spark window merge", "+int +public"]:
        want = {
            (r["docid"], round(r["score"], 9))
            for r in search(spark, full, q, k=full.n_docs).collect()
        }
        # incremental docids differ (insertion order); compare by score set
        # joined back to stable keys
        got_df = view.search(spark, q, k=view.n_docs)
        vdocs = spark.read.parquet(*[m.docs_path for m in view.segments])
        fdocs = spark.read.parquet(full.docs_path).select(
            F.col("docid").alias("fdocid"), "repo", "path", "commit"
        )
        got = {
            (r["fdocid"], round(r["score"], 9))
            for r in got_df.join(vdocs, "docid")
            .join(fdocs, ["repo", "path", "commit"])
            .select("fdocid", "score")
            .collect()
        }
        assert got == want, q

    # deletes: pick one matching doc, delete it, others' scores unchanged
    first = search(spark, full, "license", k=1).collect()[0]
    fd = spark.read.parquet(full.docs_path).filter(
        F.col("docid") == first["docid"]
    ).collect()[0]
    dview = delete_by_keys(view, [(fd["repo"], fd["path"], fd["commit"])])
    before = {
        (r["repo"], r["path"]): r["score"]
        for r in view.search(spark, "license", k=view.n_docs)
        .join(spark.read.parquet(*[m.docs_path for m in view.segments]), "docid")
        .select("repo", "path", "score").collect()
    }
    after = {
        (r["repo"], r["path"]): r["score"]
        for r in dview.search(spark, "license", k=view.n_docs)
        .join(spark.read.parquet(*[m.docs_path for m in dview.segments]), "docid")
        .select("repo", "path", "score").collect()
    }
    assert (fd["repo"], fd["path"]) in before and (fd["repo"], fd["path"]) not in after
    del before[(fd["repo"], fd["path"])]
    assert before == after  # statistics unchanged by the live-docs mask


def test_merge_reclaims_deletes_equals_live_rebuild(spark, small_corpus, tmp_path_factory):
    """Segment merge: base + delta + delete-mask merged into one segment
    is BIT-IDENTICAL (docids, scores, doc table) to a from-scratch
    rebuild over the surviving documents — Lucene merge semantics:
    deleted docs leave postings AND statistics; and the merge never
    touches content (pure postings-level remap + re-encode)."""
    from pyspark.sql import functions as F

    from solr_spark.indexer import build_index
    from solr_spark.kernel import search
    from solr_spark.segments import (
        add_segment,
        delete_by_keys,
        merge_segments,
        open_base,
    )

    docs = spark.read.parquet(small_corpus)
    seg_dir = str(tmp_path_factory.mktemp("mrg") / "view")
    cut = docs.select("repo").distinct().orderBy("repo").collect()
    mid = cut[len(cut) // 2]["repo"]
    view = open_base(
        spark, docs.filter(F.col("repo") < mid), seg_dir,
        bucket_docs=128, num_partitions=4,
    )
    view = add_segment(
        spark, view, docs.filter(F.col("repo") >= mid), seg_dir, num_partitions=4
    )
    victims = (
        spark.read.parquet(view.segments[0].docs_path)
        .orderBy("docid").limit(7).select("repo", "path", "commit").collect()
    )
    keys = [(r["repo"], r["path"], r["commit"]) for r in victims]
    view = delete_by_keys(view, keys)

    merged = merge_segments(
        spark, view, str(tmp_path_factory.mktemp("mrgout") / "seg"),
        num_partitions=4,
    )
    m = merged.segments[0]

    # fresh build over exactly the live documents
    dels = spark.createDataFrame(keys, "repo string, path string, commit string")
    live = docs.join(F.broadcast(dels), ["repo", "path", "commit"], "left_anti")
    fresh_dir = str(tmp_path_factory.mktemp("mrgfresh") / "idx")
    fresh = build_index(spark, live, fresh_dir, bucket_docs=128, num_partitions=4)

    assert m.n_docs == fresh.n_docs and m.sum_doclen == fresh.sum_doclen
    assert m.n_terms == fresh.n_terms

    md = {
        r["docid"]: (r["repo"], r["path"], r["sha256"], r["doclen"])
        for r in spark.read.parquet(m.docs_path).collect()
    }
    fd = {
        r["docid"]: (r["repo"], r["path"], r["sha256"], r["doclen"])
        for r in spark.read.parquet(fresh.docs_path).collect()
    }
    assert md == fd

    for q in ["license", "spark window merge", "+int +public"]:
        want = [
            (r["docid"], r["score"])
            for r in search(spark, fresh, q, k=fresh.n_docs).collect()
        ]
        got = [
            (r["docid"], r["score"])
            for r in search(spark, m, q, k=m.n_docs).collect()
        ]
        assert got == want, q


def test_add_segment_inherits_analyzer_and_bigrams(spark, small_corpus, tmp_path):
    from pyspark.sql import functions as F

    from solr_spark.segments import add_segment, open_base

    docs = spark.read.parquet(small_corpus)
    view = open_base(
        spark, docs.filter(F.col("path") < "src/d8"), str(tmp_path / "v"),
        bucket_docs=128, num_partitions=2, analyzer="code_stem", bigrams=False,
    )
    view = add_segment(
        spark, view, docs.filter(F.col("path") >= "src/d8"), str(tmp_path / "v"),
        num_partitions=2,
    )
    assert view.segments[1].analyzer == "code_stem"
    assert view.segments[1].has_bigrams == view.segments[0].has_bigrams


def test_verify_content_integrity(spark, small_corpus, small_index):
    from pyspark.sql import functions as F

    from solr_spark.indexer import verify_content_integrity

    src = spark.read.parquet(small_corpus)
    row = verify_content_integrity(spark, small_index, src).collect()[0]
    assert row.n_docs == 600
    assert row.n_matched == 600
    assert row.n_sha_mismatch == 0
    assert row.n_missing_in_index == 0 and row.n_missing_in_source == 0
    # a tampered source row is caught
    bad = src.withColumn(
        "content",
        F.when(F.col("path") == src.select("path").first().path, F.lit("tampered"))
        .otherwise(F.col("content")),
    )
    row2 = verify_content_integrity(spark, small_index, bad).collect()[0]
    assert row2.n_sha_mismatch >= 1


def test_segments_custom_id_cols(spark, tmp_path):
    """The incremental lifecycle (delete mask + merge) must honor the
    composite key the index was built with — id_cols is persisted in
    meta.json, not assumed to be (repo, path, commit)."""
    from solr_spark.segments import delete_by_keys, merge_segments, open_base

    rows = [
        ("orgA", "f1", "r1", "py", "alpha beta gamma"),
        ("orgA", "f2", "r1", "py", "alpha alpha delta"),
        ("orgB", "f1", "r2", "py", "beta beta beta"),
        ("orgB", "f3", "r9", "py", "gamma delta alpha"),
    ]
    src = spark.createDataFrame(
        rows, "org string, file string, rev string, lang string, content string"
    )
    view = open_base(
        spark, src, str(tmp_path / "seg"),
        id_cols=("org", "file", "rev"), bucket_docs=2, num_partitions=2,
    )
    assert view.id_cols == ["org", "file", "rev"]
    # delete one doc by its composite key: it stops matching immediately
    view = delete_by_keys(view, [("orgB", "f1", "r2")])
    hits = {r["docid"] for r in view.search(spark, "beta", k=10).collect()}
    docs = spark.read.parquet(view.segments[0].docs_path)
    deleted_docid = docs.where(
        (F.col("org") == "orgB") & (F.col("file") == "f1")
    ).collect()[0]["docid"]
    assert deleted_docid not in hits and hits
    # merge reclaims the delete and keeps the custom key columns
    merged = merge_segments(spark, view, str(tmp_path / "merged"))
    assert merged.id_cols == ["org", "file", "rev"]
    assert merged.segments[0].n_docs == 3
    mdocs = spark.read.parquet(merged.segments[0].docs_path)
    assert {"org", "file", "rev"} <= set(mdocs.columns)
    mh = {r["docid"] for r in merged.search(spark, "beta", k=10).collect()}
    assert len(mh) == 1  # only f1@orgA still contains beta
