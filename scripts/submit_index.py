#!/usr/bin/env python
"""spark-submit job entry: build the inverted index over a corpus table.

The north-rule deployment shape (BASELINE.json): the engine ships as a
zip via ``spark-submit --py-files solr_spark.zip`` to a multi-executor
cluster. This file is the driver program — it contains NO logic of its
own beyond argument parsing; everything runs through the library so the
spark-submit path and the in-process path execute identical code.

Usage (see scripts/submit.sh for the packaged invocation):
  spark-submit --master local[8] --py-files /tmp/solr_spark.zip \
      scripts/submit_index.py --corpus /tmp/corpus --out /tmp/idx \
      [--gen-docs 10000] [--bucket-docs 4096] [--query "top k terms"]

On a real cluster only --master / deploy-mode change; the job reads the
corpus from shared storage (parquet/Iceberg path) and writes the index
to shared storage the same way.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet path of the input table")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument("--gen-docs", type=int, default=0,
                    help="if >0 and corpus is absent, synthesize this many docs first")
    ap.add_argument("--bucket-docs", type=int, default=4096)
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--query", default=None, help="optional smoke query to run after the build")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # spark-submit owns master/deploy-mode; just get the provided session
    spark = SparkSession.builder.appName("solr_spark_index_build").getOrCreate()

    import os

    from solr_spark.corpus import materialize_corpus
    from solr_spark.indexer import build_index

    if args.gen_docs and not os.path.exists(os.path.join(args.corpus, "_SUCCESS")):
        materialize_corpus(spark, args.gen_docs, args.corpus)

    meta = build_index(
        spark,
        spark.read.parquet(args.corpus),
        args.out,
        bucket_docs=args.bucket_docs,
        num_partitions=args.num_partitions,
    )
    report = {
        "n_docs": meta.n_docs,
        "n_terms": meta.n_terms,
        "postings_bytes": meta.postings_bytes,
        "skew_ratio": round(meta.skew_ratio, 3),
        "stages": meta.stages,
    }
    if args.query:
        from solr_spark.kernel import Searcher

        hits = Searcher(spark, meta).search(args.query, k=10).collect()
        report["query"] = args.query
        report["hits"] = [
            {"docid": r["docid"], "score": round(r["score"], 6)} for r in hits
        ]
    print("SUBMIT_RESULT " + json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
