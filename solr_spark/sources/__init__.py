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


def read_corpus(spark: SparkSession, source: str) -> DataFrame:
    """Read the input corpus — the BASELINE.json 'Iceberg table of
    source-code repositories' shape (repo, path, commit, lang, content).

    ``source`` is either an Iceberg table identifier (``catalog.db.tbl``,
    resolved through the session's configured Iceberg catalog) or a
    parquet path (this sandbox, which ships no Iceberg runtime). Both
    scans support the pushdown the engine relies on (predicate pushdown,
    column pruning, partition pruning), so every downstream plan is
    identical; on a cluster, point it at the Iceberg table and nothing
    else changes."""
    if os.path.exists(source) or source.endswith(".parquet"):
        return spark.read.parquet(source)
    try:
        return spark.read.table(source)
    except Exception:
        return spark.read.format("iceberg").load(source)


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


def read_xml_updates(spark: SparkSession, path: str) -> DataFrame:
    """XMLLoader analog (handler/loader/XMLLoader.java:148-406): parse
    Solr's XML update format — <add><doc><field name="...">value</field>
    ...</doc></add> — into one row per <doc> with a map<string,
    array<string>> of field values (multi-valued fields keep all values,
    XMLLoader.java:374).

    Distributed shape: whole files scattered across executors
    (wholetext), parsed per-file with stdlib ElementTree inside
    mapInPandas — parse work scales with file count, nothing driver-side."""
    import pandas as pd

    src = spark.read.text(path, wholetext=True)

    def parse_files(batches):
        import xml.etree.ElementTree as ET

        for pdf in batches:
            rows = []
            for txt in pdf["value"]:
                root = ET.fromstring(txt)
                adds = [root] if root.tag == "add" else root.findall(".//add")
                for add in adds:
                    for doc in add.findall("doc"):
                        fields: dict[str, list[str]] = {}
                        for fld in doc.findall("field"):
                            name = fld.attrib.get("name", "")
                            fields.setdefault(name, []).append(fld.text or "")
                        rows.append({"fields": fields})
            if rows:
                yield pd.DataFrame(rows)

    return src.mapInPandas(parse_files, "fields map<string, array<string>>")


def read_cat(spark: SparkSession, path: str, max_lines: int | None = None) -> DataFrame:
    """cat() analog (solrj-streaming/.../io/stream/CatStream.java): emit
    (file, line_number, line) rows for files under ``path``. Line numbers
    are exact per-file ordinals: each file is read WHOLE (wholetext) and
    split with posexplode, so numbering never depends on how Spark packs
    file splits into partitions (monotonically_increasing_id only orders
    within a partition — a multi-split file would misnumber). cat() is a
    debugging/ingest stream over modest files; one task holds one file."""
    out = (
        spark.read.text(path, wholetext=True)
        .withColumn("file", F.input_file_name())
        .select(
            "file",
            F.posexplode(F.split(F.col("value"), "\n")).alias("__p", "line"),
        )
        .withColumn("line_number", (F.col("__p") + 1).cast("int"))
        .select("file", "line_number", "line")
    )
    return out.filter(F.col("line_number") <= max_lines) if max_lines else out


def write_response(
    df: DataFrame, wt: str = "json", rows: int | None = 10, start: int = 0
) -> str:
    """Response-writer surface (response/JSONResponseWriter.java,
    CSVResponseWriter.java): render a (small, already top-k'd) result
    frame as the Solr response envelope. Driver-side by design — response
    writing is the final, page-sized step; use write_commit for bulk
    exports."""
    import io

    pdf = df.toPandas()
    n_found = len(pdf)
    if rows is not None:
        pdf = pdf.iloc[start : start + rows]
    if wt == "json":
        docs = pdf.to_dict(orient="records")
        return json.dumps(
            {
                "responseHeader": {"status": 0},
                "response": {"numFound": n_found, "start": start, "docs": docs},
            },
            default=str,
        )
    if wt == "csv":
        buf = io.StringIO()
        pdf.to_csv(buf, index=False)
        return buf.getvalue()
    if wt in ("xml", "cbor", "javabin"):
        from . import writers

        fn = {
            "xml": writers.write_xml_response,
            "cbor": writers.write_cbor_response,
            "javabin": writers.write_javabin_response,
        }[wt]
        return fn(df, rows=rows, start=start)
    raise ValueError(
        f"unsupported wt={wt!r} (json, csv, xml, cbor, javabin; "
        "geojson/graphml via sources.writers)"
    )


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """jdbc() analog (JDBCStream.java:1) — Spark's JDBC source;
    partitioned reads via (partitionColumn, lowerBound, upperBound,
    numPartitions). Exercised for real against embedded Derby (the
    driver shipping inside Spark's jars) in tests/test_jdbc_real.py:
    round-trip, partitioned range scan, derived-table pushdown."""
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
