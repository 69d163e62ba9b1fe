"""Gate-facing facade: the full engine wired to the driver's test tables.

Adapts the ``documents`` table (doc_id, text, lang, source) to the
engine's source-code-corpus shape (repo, path, commit, lang, content —
the BASELINE.json input hint), builds/caches the index, and exposes
search with the rounded-score ranking contract shared with the DuckDB
oracle (see oracle.py for why ranking happens on the 6-dp-rounded score).

docid determinism: repo := source, path := lpad(doc_id, 8), commit := '0',
so the engine's global (repo, path, commit) sort ordinal — the docid —
enumerates documents in (source, doc_id) order at ANY parallelism, and
the oracle's tie-break ORDER BY source, doc_id equals docid ascending.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .indexer import IndexMeta, build_index
from .kernel import dismax_search, search
from .qparser import Query, parse

ENGINE_VERSION = "v1"  # bump to invalidate cached gate indexes


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (repo, path, commit, lang, content)."""
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        F.col("source").alias("repo"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("path"),
        F.lit("0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def ensure_index(spark: SparkSession, sf_dir: str, bucket_docs: int = 512) -> IndexMeta:
    """Build (or reuse, via the indexer's resume manifest) the index for
    one sf_dir under a content-addressed temp location."""
    key = hashlib.md5(f"{ENGINE_VERSION}:{os.path.abspath(sf_dir)}:{bucket_docs}".encode()).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"solr_spark_gate_{key}")
    return build_index(
        spark,
        documents_as_corpus(spark, sf_dir),
        out,
        bucket_docs=bucket_docs,
        resume=True,
    )


def _with_doc_id(spark: SparkSession, meta: IndexMeta, res: DataFrame) -> DataFrame:
    docs = spark.read.parquet(meta.docs_path).select("docid", "path")
    return res.join(docs, "docid").withColumn(
        "doc_id", F.col("path").cast("bigint")
    )


def gate_search(spark: SparkSession, sf_dir: str, q: str, k: int = 10) -> DataFrame:
    """Top-k BM25 with the oracle's ranking contract: rank by
    (round(score, 6) desc, docid asc); emit (doc_id, score)."""
    meta = ensure_index(spark, sf_dir)
    query: Query = parse(q)
    if "source" in query.filters:  # source column is mapped onto repo
        query.filters.setdefault("repo", []).extend(query.filters.pop("source"))
    res = search(spark, meta, query, k=meta.n_docs, prune=True)
    out = _with_doc_id(spark, meta, res).withColumn(
        "score", F.round(F.col("score"), 6)
    )
    return (
        out.orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
        .select("doc_id", "score")
    )


def gate_dismax(
    spark: SparkSession, sf_dir: str, terms: list[str], tie: float, k: int
) -> DataFrame:
    """DisMax ranking under the same rounded-score contract."""
    meta = ensure_index(spark, sf_dir)
    res = dismax_search(spark, meta, terms, tie=tie, k=meta.n_docs)
    out = _with_doc_id(spark, meta, res).withColumn(
        "score", F.round(F.col("score"), 6)
    )
    return (
        out.orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
        .select("doc_id", "score")
    )


def gate_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global term dictionary (term, df, cf) — exact corpus-wide
    stats (stronger than the reference's default per-shard IDF;
    solr/core/src/java/org/apache/solr/search/stats/ExactStatsCache.java:61)."""
    meta = ensure_index(spark, sf_dir)
    return spark.read.parquet(meta.terms_path).select("term", "df", "cf")
