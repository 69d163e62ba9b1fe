"""Sources + streaming tests: topic HWM protocol, daemon loop, watermarked
streaming timeseries (micro-batch commit semantics,
/root/reference/solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java:105-146;
topic checkpointing, solrj-streaming/.../io/stream/TopicStream.java:75-111).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from solr_spark import sources, streaming


def test_topic_checkpoint_cycle(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    df = spark.range(0, 100).withColumnRenamed("id", "version")
    # first consumption: everything
    batch1 = sources.topic_read(df, "version", checkpoint_dir=ckpt)
    assert batch1.count() == 100
    assert sources.topic_commit(batch1, "version", ckpt) == 99
    # nothing new
    assert sources.topic_read(df, "version", checkpoint_dir=ckpt).count() == 0
    # new rows arrive
    df2 = spark.range(0, 150).withColumnRenamed("id", "version")
    batch2 = sources.topic_read(df2, "version", checkpoint_dir=ckpt)
    assert batch2.count() == 50
    assert sources.topic_commit(batch2, "version", ckpt) == 149
    # hwm survives "restart" (fresh read of the manifest)
    assert sources.topic_hwm(ckpt) == 149


def test_daemon_run():
    seen = []
    n = streaming.daemon_run(lambda i: seen.append(i), 0.01, 3)
    assert n == 3 and seen == [0, 1, 2]


def test_streaming_timeseries(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events = spark.createDataFrame(
        [(i, f"2024-01-01 0{i % 3}:15:00") for i in range(30)],
        "id long, ts_s string",
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts"))
    events.write.parquet(src)
    stream = streaming.stream_events(
        spark, src, "id long, ts timestamp", "ts", "1 hour", "2 hours",
        [F.count(F.lit(1)).alias("cnt")],
    )
    # batch 1: ingests hours 0-2; append mode emits nothing until the
    # watermark passes the window ends (late-data contract)
    streaming.run_stream_once(stream, ckpt, out)
    assert spark.read.parquet(out).count() == 0
    # batch 2: a far-future event advances the watermark → closed windows flush
    spark.createDataFrame(
        [(99, "2024-01-10 00:00:00")], "id long, ts_s string"
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts")).write.mode(
        "append"
    ).parquet(src)
    streaming.run_stream_once(stream, ckpt, out)
    got = {
        r["bucket_start"].hour: r["cnt"]
        for r in spark.read.parquet(out).collect()
    }
    assert got == {0: 10, 1: 10, 2: 10}


def test_csv_json_roundtrip(spark, tmp_path):
    p_csv = str(tmp_path / "x.csv")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    df.write.option("header", True).csv(p_csv)
    back = sources.read_csv(spark, p_csv, schema="id int, s string")
    assert sorted((r["id"], r["s"]) for r in back.collect()) == [(1, "a"), (2, "b")]
    p_json = str(tmp_path / "x.json")
    df.write.json(p_json)
    back = sources.read_json(spark, p_json, schema="id int, s string")
    assert back.count() == 2


def test_write_commit_atomic_marker(spark, tmp_path):
    out = str(tmp_path / "sink")
    sources.write_commit(spark.range(10), out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert spark.read.parquet(out).count() == 10


def test_read_xml_updates(spark, tmp_path):
    """XMLLoader format: <add><doc><field name=..>v</field></doc></add>
    with multi-valued fields (XMLLoader.java:374)."""
    from solr_spark.sources import read_xml_updates

    p = tmp_path / "batch1.xml"
    p.write_text(
        """<add>
  <doc><field name="id">1</field><field name="tag">a</field><field name="tag">b</field></doc>
  <doc><field name="id">2</field><field name="title">hello</field></doc>
</add>"""
    )
    rows = read_xml_updates(spark, str(tmp_path)).collect()
    by_id = {r["fields"]["id"][0]: r["fields"] for r in rows}
    assert by_id["1"]["tag"] == ["a", "b"]
    assert by_id["2"]["title"] == ["hello"]


def test_read_cat(spark, tmp_path):
    from solr_spark.sources import read_cat

    (tmp_path / "a.txt").write_text("l1\nl2\nl3\n")
    out = read_cat(spark, str(tmp_path / "a.txt"), max_lines=2).collect()
    assert [(r["line_number"], r["line"]) for r in sorted(out, key=lambda r: r["line_number"])] == [
        (1, "l1"), (2, "l2"),
    ]


def test_write_response(spark):
    import json as _json

    from solr_spark.sources import write_response

    df = spark.createDataFrame([(1, 9.5), (2, 8.0), (3, 1.0)], "id int, score double")
    env = _json.loads(write_response(df.orderBy("id"), wt="json", rows=2))
    assert env["response"]["numFound"] == 3
    assert [d["id"] for d in env["response"]["docs"]] == [1, 2]
    csv = write_response(df.orderBy("id"), wt="csv", rows=3)
    assert csv.splitlines()[0] == "id,score" and len(csv.splitlines()) == 4


def test_stream_index_batches_equal_full_rebuild(spark, small_corpus, tmp_path):
    """Structured-Streaming ingestion: micro-batches flushed as delta
    segments through stream_index answer queries identically to a
    from-scratch rebuild of the same corpus (the streaming form of the
    addDoc -> segment flush -> commit lifecycle), and a second drain with
    no new input adds no segments (replay idempotency via the manifest's
    batch_id ledger)."""
    from pyspark.sql import functions as F

    from solr_spark.corpus import CORPUS_SCHEMA
    from solr_spark.indexer import build_index
    from solr_spark.kernel import search
    from solr_spark.streaming import stream_index

    docs = spark.read.parquet(small_corpus)
    src = str(tmp_path / "src")
    out = str(tmp_path / "segs")
    ckpt = str(tmp_path / "ckpt")

    cut = docs.select("repo").distinct().orderBy("repo").collect()
    mid = cut[len(cut) // 2]["repo"]
    docs.filter(F.col("repo") < mid).write.mode("append").parquet(src)
    view = stream_index(
        spark, src, CORPUS_SCHEMA, out, ckpt, bucket_docs=128, num_partitions=4
    )
    n_first = view.n_docs
    assert len(view.segments) >= 1 and n_first > 0

    # second wave of documents arrives; drain again
    docs.filter(F.col("repo") >= mid).write.mode("append").parquet(src)
    view = stream_index(
        spark, src, CORPUS_SCHEMA, out, ckpt, bucket_docs=128, num_partitions=4
    )
    assert view.n_docs == docs.count() > n_first

    full_dir = str(tmp_path / "full")
    full = build_index(spark, docs, full_dir, bucket_docs=128, num_partitions=4)
    assert view.n_docs == full.n_docs and view.avgdl == full.avgdl
    for q in ["license", "spark window merge"]:
        want = sorted(
            round(r["score"], 9) for r in search(spark, full, q, k=full.n_docs).collect()
        )
        got = sorted(
            round(r["score"], 9) for r in view.search(spark, q, k=view.n_docs).collect()
        )
        assert got == want, q

    # no new input -> no new segments (and replay of committed batches skips)
    n_segs = len(view.segments)
    view = stream_index(
        spark, src, CORPUS_SCHEMA, out, ckpt, bucket_docs=128, num_partitions=4
    )
    assert len(view.segments) == n_segs


def test_read_corpus_parquet_fallback(spark, small_corpus):
    from solr_spark.sources import read_corpus

    df = read_corpus(spark, small_corpus)
    assert df.count() == 600
    assert set(df.columns) >= {"repo", "path", "commit", "lang", "content"}


def test_read_cat_multiline_order(spark, tmp_path):
    f = tmp_path / "lines.txt"
    f.write_text("\n".join(f"line{i}" for i in range(50)))
    out = sources.read_cat(spark, str(tmp_path)).orderBy("line_number").collect()
    assert [r["line"] for r in out[:3]] == ["line0", "line1", "line2"]
    assert out[49]["line_number"] == 50 and out[49]["line"] == "line49"
