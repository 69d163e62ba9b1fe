#!/usr/bin/env python3
"""Scale-factor sweep: measure how each headline component scales with
input size, and fit per-component scaling exponents (t ~ n^alpha).

Two axes, matching what the sandbox can actually vary:

1. CORPUS AXIS (the fulltext pipeline, the north-star metric): build
   the inverted index + run the BM25 query set at 120k / 480k / 1.2M
   synthetic docs (sf0.1 / sf0.4 / sf1.0 equivalents of the driver
   protocol's 120k corpus).  Corpus generation is outside the timed
   region; one untimed warm build per JVM precedes measurement (the
   BASELINE.md protocol).

2. TABLE AXIS (relational / dedup / ANN operators): run the bench's
   gate-query subset at /root/testdata/sf0.001, sf0.01 and sf0.1 and
   fit exponents across the two decade steps where the driving table
   actually grows (documents and embeddings are flat between sf0.001
   and sf0.01, so those entries fit only the 0.01→0.1 step).

Output: one JSON document on stdout; the caller appends it to
BENCH_SCALING.json under "sf_sweep" and summarizes in BASELINE.md.

alpha interpretation: 1.0 = linear in input, <1 sublinear (fixed
overheads amortizing), >1 superlinear (a scale problem).  Fit is
log(t2/t1)/log(n2/n1) per step; "alpha" reports the LAST step (the
largest inputs, where asymptotics dominate).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FTS_QUERIES = [
    "license", "zzfrobnicate", "class def return", "+public +static",
    "int -license", "qqxylophone7 the license", "getvalueimpl",
    "max_size num_count", "+zzfrobnicate +license",
    "public static void class",
]

CORPUS_SIZES = [120_000, 480_000, 1_200_000]
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
GATE_QUERIES = ["a_rollup_q1", "j_inner_join", "w_collapse",
                "a_timeseries_hourly", "t_minhash_pairs", "t_token_stats",
                "e_knn_brute", "r_topk"]
# driving table per gate query (for the n in t ~ n^alpha); documents
# and embeddings are FLAT between sf0.001 and sf0.01 — exponents fit
# only across steps where n actually grows
_DRIVER_TABLE = {
    "a_rollup_q1": "lineitem", "j_inner_join": "lineitem",
    "w_collapse": "lineitem", "a_timeseries_hourly": "events",
    "t_minhash_pairs": "documents", "t_token_stats": "documents",
    "e_knn_brute": "embeddings", "r_topk": "lineitem",
}


def table_rows(sf_dir: str, table: str) -> int:
    import duckdb

    return duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/{table}.parquet'"
    ).fetchone()[0]


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SOLR_SWEEP_REPEATS", "2"))

    from solr_spark.corpus import materialize_corpus
    from solr_spark.indexer import build_index
    from solr_spark.kernel import Searcher
    from solr_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="solr_spark_sweep",
                      shuffle_partitions=cpus)

    out: dict = {"cpus": cpus, "corpus_axis": [], "table_axis": {}}

    # --- corpus axis ------------------------------------------------------
    warm_done = False
    for n_docs in CORPUS_SIZES:
        corpus_path = f"/tmp/solr_spark_bench_corpus_{n_docs}"
        if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
            materialize_corpus(spark, n_docs, corpus_path,
                               num_partitions=128)
        docs = spark.read.parquet(corpus_path)
        idx_dir = f"/tmp/solr_spark_sweep_idx_{n_docs}"
        if not warm_done:  # one untimed full build per JVM
            shutil.rmtree(idx_dir, ignore_errors=True)
            build_index(spark, docs, idx_dir, num_partitions=cpus)
            warm_done = True
        walls = []
        for _ in range(repeats):
            shutil.rmtree(idx_dir, ignore_errors=True)
            t0 = time.time()
            meta = build_index(spark, docs, idx_dir, num_partitions=cpus)
            walls.append(time.time() - t0)
        wall = min(walls)
        searcher = Searcher(spark, meta)
        for q in FTS_QUERIES:  # warm plans
            searcher.search(q, k=10).collect()
        lat = []
        for q in FTS_QUERIES:
            t0 = time.time()
            searcher.search(q, k=10).collect()
            lat.append(time.time() - t0)
        row = {
            "n_docs": n_docs,
            "index_build_s": round(wall, 3),
            "index_build_walls": [round(w, 3) for w in walls],
            "docs_per_sec": round(meta.n_docs / wall, 1),
            "postings_bytes": meta.postings_bytes,
            "fts_p50_s": round(statistics.median(lat), 3),
            "fts_total_s": round(sum(lat), 3),
        }
        out["corpus_axis"].append(row)
        print(f"# corpus {n_docs}: build {wall:.1f}s "
              f"({row['docs_per_sec']}/s) fts_p50 {row['fts_p50_s']}s",
              file=sys.stderr)

    rows = out["corpus_axis"]
    for a, b in zip(rows, rows[1:]):
        step = math.log(b["n_docs"] / a["n_docs"])
        b["alpha_build"] = round(
            math.log(b["index_build_s"] / a["index_build_s"]) / step, 3)
        b["alpha_fts_total"] = round(
            math.log(b["fts_total_s"] / a["fts_total_s"]) / step, 3)

    # --- table axis -------------------------------------------------------
    from solr_spark import gate

    for sf_dir in SF_DIRS:
        per = {}
        for name in GATE_QUERIES:
            fn, _sql = gate.ENTRIES[name]
            fn(spark, sf_dir).collect()  # warm (plan + codegen + caches)
            t0 = time.time()
            fn(spark, sf_dir).collect()
            per[name] = round(time.time() - t0, 3)
        out["table_axis"][sf_dir] = per
        print(f"# {sf_dir}: {per}", file=sys.stderr)

    alphas = {}
    for name in GATE_QUERIES:
        table = _DRIVER_TABLE[name]
        pts = [
            (table_rows(sf, table), out["table_axis"][sf][name])
            for sf in SF_DIRS
        ]
        steps = [
            round(math.log(t2 / t1) / math.log(n2 / n1), 3)
            for (n1, t1), (n2, t2) in zip(pts, pts[1:])
            if n2 > n1 and t1 > 0
        ]
        alphas[name] = {"driving_table": table, "steps": steps,
                        "alpha": steps[-1] if steps else None}
    out["table_axis_alphas"] = alphas

    print(json.dumps(out))


if __name__ == "__main__":
    main()
