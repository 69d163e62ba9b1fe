"""Sources & sinks — ingest loaders, incremental topic reads, exports.

Reference (paths under /root/reference/solr/):
- JSON/CSV/XML loaders: core/.../handler/loader/{JsonLoader,CSVLoader,XMLLoader}.java
- jdbc() stream:        solrj-streaming/.../io/stream/JDBCStream.java:1
- topic() checkpointed incremental consumption:
                        solrj-streaming/.../io/stream/TopicStream.java:75-111
- update()/commit() sinks: solrj-streaming/.../io/stream/{UpdateStream,CommitStream}.java
- response writers:     core/.../response/{JSONResponseWriter,CSVResponseWriter}.java

Spark mapping: loaders are spark.read.*; the topic() high-water-mark is a
tiny JSON checkpoint next to the data (the commit point), and a "commit"
is parquet's atomic _SUCCESS-gated directory write — the same
write-temp-then-manifest pattern the indexer uses (indexer.py stage gates).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one driver test table (predicate pushdown + column
    pruning come free from the parquet source)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JsonLoader analog (handler/loader/JsonLoader.java:1)."""
    r = spark.read
    if schema:
        r = r.schema(schema)
    return r.json(path)


def read_csv(spark: SparkSession, path: str, schema: str | None = None, header: bool = True) -> DataFrame:
    """CSVLoader analog (handler/loader/CSVLoader.java)."""
    r = spark.read.option("header", header)
    if schema:
        r = r.schema(schema)
    return r.csv(path)


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """jdbc() analog (JDBCStream.java:1) — thin passthrough; partitioned
    reads via (partitionColumn, lowerBound, upperBound, numPartitions)."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


# --- topic(): checkpointed incremental consumption -----------------------


def _ckpt_file(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "topic_hwm.json")


def topic_hwm(checkpoint_dir: str) -> int:
    """Read the persisted high-water mark (TopicStream checkpoints
    persisted to a collection, TopicStream.java:75-111; ours is a JSON
    manifest)."""
    try:
        with open(_ckpt_file(checkpoint_dir)) as f:
            return int(json.load(f)["hwm"])
    except (OSError, ValueError, KeyError):
        return -1


def topic_read(
    df: DataFrame,
    version_col: str,
    checkpoint_dir: str | None = None,
    hwm: int | None = None,
) -> DataFrame:
    """topic(): rows with version > high-water mark. The HWM comes from an
    explicit argument or the checkpoint dir. Pair with topic_commit()
    after the batch lands to advance the checkpoint — exactly the
    read-then-checkpoint protocol of TopicStream (and of Solr's
    _version_-ordered tlog consumption, update/UpdateLog.java)."""
    if hwm is None:
        hwm = topic_hwm(checkpoint_dir) if checkpoint_dir else -1
    return df.filter(F.col(version_col) > F.lit(hwm))


def topic_commit(df: DataFrame, version_col: str, checkpoint_dir: str) -> int:
    """Advance the checkpoint to max(version) of the consumed batch.
    Write is atomic (temp file + rename)."""
    row = df.agg(F.max(version_col).alias("m")).collect()[0]
    new_hwm = int(row["m"]) if row["m"] is not None else topic_hwm(checkpoint_dir)
    os.makedirs(checkpoint_dir, exist_ok=True)
    tmp = _ckpt_file(checkpoint_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"hwm": new_hwm}, f)
    os.replace(tmp, _ckpt_file(checkpoint_dir))
    return new_hwm


def write_commit(df: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    """update()+commit() sink: parquet directory write; visibility is the
    atomic _SUCCESS marker (CommitStream.java:1 batch-commit semantics;
    soft-commit analog = a new snapshot directory)."""
    df.write.mode(mode).parquet(out_dir)
