#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Components (each timed separately in "queries"):
  - index_build      full inverted-index build over the synthetic
                     source-code corpus (BASELINE.json input shape);
                     corpus generation is materialized once OUTSIDE the
                     timed region. docs/sec is reported alongside.
  - fts_p50          median latency of the BM25 query set against the
                     built index (k=10, warm), the reference's
                     SimpleSearch analog.
  - representative relational / dedup / ANN / rollup queries from the
    gate registry, run at $SPARK_GRAFT_SF_DIR (default sf0.1).

Environment:
  SPARK_GRAFT_SF_DIR  table dir   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local cores (default 32)
  SOLR_BENCH_DOCS     corpus size for index_build (default 30000)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Query mix over the synthetic corpus's actual vocabulary (corpus.py:
# keywords + camelCase identifiers + snake_case + planted rare terms) —
# hot single term, rare term, disjunction, conjunction, prohibition,
# mixed-frequency, identifier and snake_case shapes. (The round-1 set
# reused gate-table terms absent from this corpus, so half the latencies
# measured the empty-result fast path.)
FTS_QUERIES = [
    "license",
    "zzfrobnicate",
    "class def return",
    "+public +static",
    "int -license",
    "qqxylophone7 the license",
    "getvalueimpl",
    "max_size num_count",
    "+zzfrobnicate +license",
    "public static void class",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SOLR_BENCH_DOCS", "120000"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from solr_spark.corpus import materialize_corpus
    from solr_spark.indexer import build_index
    from solr_spark.kernel import Searcher
    from solr_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="solr_spark_bench",
                      shuffle_partitions=cpus)
    timings: dict[str, float] = {}

    # --- corpus (untimed, cached across runs) -----------------------------
    corpus_path = f"/tmp/solr_spark_bench_corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        materialize_corpus(spark, n_docs, corpus_path, num_partitions=128)

    # --- JMH-style warm-up: one untimed FULL-SIZE build per JVM (the
    # BASELINE.md protocol and the reference harness's @Warmup pattern) —
    # codegen, python-worker startup and first-touch page faults are
    # per-process constants, paid here, outside the measured region ------
    warm_dir = "/tmp/solr_spark_bench_warm"
    shutil.rmtree(warm_dir, ignore_errors=True)
    build_index(spark, spark.read.parquet(corpus_path), warm_dir,
                num_partitions=cpus)

    # --- index build (timed, median of 3 — the BASELINE.md protocol) ------
    walls = []
    idx_dir = f"/tmp/solr_spark_bench_idx_{n_docs}_{cpus}"
    for _ in range(3):
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.time()
        meta = build_index(spark, spark.read.parquet(corpus_path), idx_dir,
                           num_partitions=cpus)
        walls.append(time.time() - t0)
    timings["index_build"] = round(statistics.median(walls), 3)
    timings["index_build_best"] = round(min(walls), 3)
    docs_per_sec = round(meta.n_docs / timings["index_build"], 1)

    # --- BM25 query latencies (warm Searcher: terms+docs cached, the
    # SolrIndexSearcher pattern; one throwaway run first) ------------------
    searcher = Searcher(spark, meta)
    for q in FTS_QUERIES:  # warm each query shape once (plan + codegen)
        searcher.search(q, k=10).collect()
    lat = []
    for q in FTS_QUERIES:
        t0 = time.time()
        searcher.search(q, k=10).collect()
        lat.append(time.time() - t0)
    timings["fts_p50"] = round(statistics.median(lat), 3)
    timings["fts_total"] = round(sum(lat), 3)

    # --- representative gate queries at sf_dir ----------------------------
    from solr_spark import gate

    for name in [
        "a_rollup_q1",
        "j_hash_broadcast",
        "j_inner_join",
        "w_collapse",
        "a_timeseries_hourly",
        "t_minhash_pairs",
        "t_token_stats",
        "e_knn_brute",
        "r_topk",
    ]:
        fn, _sql = gate.ENTRIES[name]
        t0 = time.time()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()) - timings["fts_total"], 3)
    print(
        json.dumps(
            {
                "metric": "index_build+bm25+operator suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "docs_indexed": meta.n_docs,
                "docs_per_sec": docs_per_sec,
                "postings_bytes": meta.postings_bytes,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
