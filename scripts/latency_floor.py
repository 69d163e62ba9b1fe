#!/usr/bin/env python3
"""Interactive-latency decomposition: WHERE does the ~0.1-0.5 s
per-query floor come from, and what does the warm-searcher path
(Searcher.warm_terms hot-postings pin) buy?

Components measured (median of N, after warm-up):
  job_floor      spark.range(1).count() — pure job scheduling
  collect_floor  2-row DataFrame collect (adds Arrow/driver transfer)
  pyworker_floor one Arrow-batched pandas_udf stage over 2 rows
                 (adds the python-worker round trip the cogrouped
                 BM25 kernel pays)
  search_scan    Searcher p50 over the query mix, pruned parquet scans
  search_hot     same queries with the hot-term postings pinned
                 (warm_terms over the mix's vocabulary)

Prints one JSON line; the caller records it in BASELINE.md.
"""

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "license", "zzfrobnicate", "class def return", "+public +static",
    "int -license", "qqxylophone7 the license", "getvalueimpl",
    "max_size num_count", "+zzfrobnicate +license",
    "public static void class",
]
HOT_TERMS = sorted({t.lstrip("+-") for q in QUERIES for t in q.split()})


def med(fn, n=9):
    fn()  # warm
    xs = []
    for _ in range(n):
        t0 = time.time()
        fn()
        xs.append(time.time() - t0)
    return round(statistics.median(xs), 4)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SOLR_BENCH_DOCS", "120000"))

    import pandas as pd
    from pyspark.sql import functions as F

    from solr_spark.corpus import materialize_corpus
    from solr_spark.indexer import build_index
    from solr_spark.kernel import Searcher
    from solr_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="latency_floor",
                      shuffle_partitions=cpus)

    corpus_path = f"/tmp/solr_spark_bench_corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        materialize_corpus(spark, n_docs, corpus_path, num_partitions=128)
    idx_dir = f"/tmp/solr_spark_floor_idx_{n_docs}"
    if not os.path.exists(idx_dir):
        shutil.rmtree(idx_dir, ignore_errors=True)
        build_index(spark, spark.read.parquet(corpus_path), idx_dir,
                    num_partitions=cpus)
    meta_df = spark.read.parquet(corpus_path)  # noqa: F841  (touch FS cache)

    out: dict = {"cpus": cpus, "n_docs": n_docs}
    out["job_floor_s"] = med(lambda: spark.range(1).count())
    tiny = spark.range(2).select(F.col("id"), (F.col("id") * 2).alias("v"))
    out["collect_floor_s"] = med(lambda: tiny.collect())

    @F.pandas_udf("long")
    def _pyw(s: pd.Series) -> pd.Series:
        return s

    pydf = spark.range(2).select(_pyw("id").alias("x"))
    out["pyworker_floor_s"] = med(lambda: pydf.collect())

    from solr_spark.indexer import IndexMeta

    meta = IndexMeta.load(idx_dir)
    searcher = Searcher(spark, meta)

    def run_all():
        for q in QUERIES:
            searcher.search(q, k=10).collect()

    run_all()  # per-query plan/codegen warm-up
    lat = []
    for q in QUERIES:
        t0 = time.time()
        searcher.search(q, k=10).collect()
        lat.append(time.time() - t0)
    out["search_scan_p50_s"] = round(statistics.median(lat), 4)

    out["hot_postings_rows"] = searcher.warm_terms(HOT_TERMS)
    run_all()  # hot-path plan warm-up
    lat = []
    for q in QUERIES:
        t0 = time.time()
        searcher.search(q, k=10).collect()
        lat.append(time.time() - t0)
    out["search_hot_p50_s"] = round(statistics.median(lat), 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
