"""Distributed inverted-index build — the engine's ingest pipeline.

Mirrors the reference's update lifecycle (loader -> processor chain ->
analysis -> segment flush -> segment merge -> commit;
solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java:309-409
and update/DocumentBuilder.java:99-224) as a sequence of Spark stages over
ordinary parquet tables:

  [1] analyze   ONE pass over content (the expensive scan): range-shuffle
                by (repo,path,commit) -> sortWithinPartitions -> mapInPandas
                tokenizer emitting a union-typed staging table
                (doc rows + posting triples + per-partition lineage metrics)
  [2] doc_stats docid = global sort ordinal (offset[pid] + local_idx —
                deterministic across any parallelism), sha256, doclen,
                bucket = docid DIV bucket_docs; global N / avgdl
  [3] postings  two sub-stages forming a sorted-merge shuffle keyed
                (term, bucket):
                [3a] per-partition sorted partial posting runs — each task
                     reads ONE staging file directly with pyarrow (the
                     triples never cross the JVM→Python row pipe) and
                     emits delta+varint runs per (term, bucket);
                     checkpointed under _stage/runs
                [3b] range exchange of the COMPACT runs on (term, bucket),
                     JVM sort by (term, bucket, min_docid), then a
                     vectorized decode→merge→re-encode pass producing
                     delta+varint blocks with block-max metadata —
                     byte-identical to encoding raw triples, at a shuffle
                     cost of ~postings bytes instead of ~raw-triple rows.
                Hot-term skew is structurally salted: a term's postings
                split across docid buckets, so no single reducer ever
                sees more than bucket_docs postings per term (the
                reference's CompositeIdRouter-style routing,
                solrj/src/java/org/apache/solr/common/cloud/CompositeIdRouter.java:136-148).
  [4] term_stats global (df, cf) per term — exact global IDF, stronger
                than the reference's default per-shard IDF
                (solr/core/src/java/org/apache/solr/search/stats/ExactStatsCache.java:61)
  [5] meta.json config + global stats + per-stage & per-partition lineage

Every stage is idempotent (mode=overwrite) and gated on its _SUCCESS
marker, so a killed build resumes without recomputing completed stages —
the analog of the reference's transaction-log replay
(solr/core/src/java/org/apache/solr/update/UpdateLog.java:131-133,1194).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict, dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.accumulators import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analysis import term_frequencies

# Narrow union schema: posting rows dominate (~500× doc rows), so they
# carry exactly one object column. Doc rows pack their metadata into that
# column as "repo\x01path\x01commit\x01lang\x01sha256" (split JVM-side in
# stage 2 — id columns must not contain \x01).
STAGE_SCHEMA = "kind tinyint, pid int, local_idx bigint, term string, tf bigint, doclen bigint"
_META_SEP = "\x01"

POSTINGS_SCHEMA = (
    "term string, bucket bigint, df bigint, cf bigint, "
    "doc_bytes binary, tf_bytes binary, "
    "block_offs_doc array<int>, block_offs_tf array<int>, "
    "block_last array<bigint>, block_max_tf array<int>, block_min_dl array<int>"
)

DEFAULT_BUCKET_DOCS = 4096


@dataclass
class IndexMeta:
    out_dir: str
    n_docs: int = 0
    sum_doclen: int = 0
    avgdl: float = 0.0
    bucket_docs: int = DEFAULT_BUCKET_DOCS
    docid_base: int = 0  # first docid of this segment (bucket-aligned)
    # composite unique-key columns of the source table — segments.py's
    # delete masks / merge remap key on these, so they are part of the
    # persisted index contract, not just a build_index argument
    id_cols: list = field(default_factory=lambda: ["repo", "path", "commit"])
    has_bigrams: bool = False  # adjacent-pair postings present (phrase path)
    has_positions: bool = False  # positional postings present (positions.py)
    has_payloads: bool = False  # per-position payloads present (positions.py)
    analyzer: str = "code"  # analysis.ANALYZERS key used at build time
    # index-time synonym rules (analysis.SynonymGraph.to_meta form) — part
    # of the persisted index contract: positional builds, delta segments
    # and merges must reproduce the same injected postings
    synonyms: dict | None = None
    n_terms: int = 0
    postings_rows: int = 0
    postings_bytes: int = 0
    skew_max_df: int = 0
    skew_ratio: float = 0.0
    stages: dict = field(default_factory=dict)
    lineage: list = field(default_factory=list)

    @property
    def docs_path(self) -> str:
        return os.path.join(self.out_dir, "docs")

    @property
    def postings_path(self) -> str:
        return os.path.join(self.out_dir, "postings")

    @property
    def bucket_stats_path(self) -> str:
        return os.path.join(self.out_dir, "bucket_stats")

    @property
    def terms_path(self) -> str:
        return os.path.join(self.out_dir, "terms")

    @property
    def terms_rev_path(self) -> str:
        """Reversed term dictionary (sorted by reversed term) — the
        leading-wildcard prefix-scan table; may be absent on indexes
        built before it existed (query path falls back to a LIKE
        scan)."""
        return os.path.join(self.out_dir, "terms_rev")

    @property
    def terms_ngrams_path(self) -> str:
        """Bigram inverted index over the term dictionary (gram, term,
        tlen; one row per gram OCCURRENCE, range-sorted by gram) — the
        fuzzy/spellcheck candidate prefilter (the engine's alternative
        to Lucene's Levenshtein automata): a pattern's candidates are
        the terms sharing >= max(|t|,|p|)-1-2k bigrams, a pushed-down
        IN scan + count instead of a full-vocabulary edit-distance
        pass. May be absent on older indexes (fallback: scan)."""
        return os.path.join(self.out_dir, "terms_ngrams")

    def save(self) -> None:
        with open(os.path.join(self.out_dir, "meta.json"), "w") as f:
            json.dump(asdict(self), f, indent=1)

    @classmethod
    def load(cls, out_dir: str) -> "IndexMeta":
        with open(os.path.join(out_dir, "meta.json")) as f:
            d = json.load(f)
        d["out_dir"] = out_dir
        return cls(**d)


class _DictSumParam(AccumulatorParam):
    """Accumulator merging {key: tuple-of-numbers} by element-wise sum."""

    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        for k, v in b.items():
            if k in a:
                a[k] = tuple(x + y for x, y in zip(a[k], v))
            else:
                a[k] = v
        return a


def _analyze_partitions(
    stats_acc=None,
    bigrams: bool = False,
    term_transform=None,
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    synonyms=None,
    pre_transform=None,
):
    """mapInPandas closure: tokenize + hash one sorted partition, emitting
    union-typed rows. local_idx is the row ordinal within the partition.

    ``stats_acc`` (optional _DictSumParam accumulator) collects
    {pid: (n_docs, sum_doclen, n_postings, millis)} with the stage job
    itself — this replaces three follow-up aggregation jobs on the driver
    (offsets, global doclen stats, lineage). Accumulator updates in
    transformations are not exactly-once under task retries/speculation,
    so build_index only trusts them when _accumulators_exact(spark) says
    the runtime cannot retry (local master, maxFailures=1, no
    speculation); otherwise it re-derives the stats from the staged
    kind=2 metrics rows, which ARE exactly-once (parquet task commit)."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        pid = -1
        n_docs = 0
        n_postings = 0
        sum_doclen = 0
        t0 = time.time()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["pid"].iloc[0])
            ids = np.arange(local, local + len(pdf), dtype=np.int64)
            local += len(pdf)
            n_docs += len(pdf)
            # pre_transform (PRE_TRANSFORMS, e.g. the text_cjk bigram
            # fold) feeds ONLY the tokenizer — the stored content and its
            # integrity sha256 stay byte-identical to the source
            tok_text = (
                pdf["content"] if pre_transform is None
                else pdf["content"].map(pre_transform)
            )
            triples, doclens = term_frequencies(
                ids, tok_text, bigrams=bigrams,
                term_transform=term_transform, synonyms=synonyms,
            )
            sum_doclen += int(doclens["doclen"].sum())
            sha = pdf["content"].map(lambda s: hashlib.sha256((s or "").encode()).hexdigest())
            meta_cols = [pdf[c].astype(str) for c in id_cols] + [
                pdf["lang"].fillna("").astype(str)
            ]
            for c, series in zip([*id_cols, "lang"], meta_cols):
                # the packed metadata row is positional — a separator
                # byte inside a value would silently shift every
                # downstream column, so fail the task loudly instead
                if series.str.contains(_META_SEP, regex=False).any():
                    raise ValueError(
                        f"column {c!r} contains the reserved \x01 "
                        "metadata separator"
                    )
            packed = meta_cols[0]
            for series in meta_cols[1:]:
                packed = packed + _META_SEP + series
            packed = packed + _META_SEP + sha
            yield pd.DataFrame(
                {
                    "kind": np.int8(0),
                    "pid": np.int32(pid),
                    "local_idx": ids,
                    "term": packed.to_numpy(),
                    "tf": np.int64(0),
                    "doclen": doclens["doclen"].to_numpy(),
                }
            )
            if len(triples):
                n_postings += len(triples)
                yield pd.DataFrame(
                    {
                        "kind": np.int8(1),
                        "pid": np.int32(pid),
                        "local_idx": triples["docid"].to_numpy(),
                        # Arrow-backed string column — stays a flat buffer
                        # through the Arrow serializer (no Python strings)
                        "term": triples["term"],
                        "tf": triples["tf"].to_numpy(),
                        "doclen": triples["doclen"].to_numpy(),
                    }
                )
        if pid >= 0:  # per-partition lineage metrics row
            if stats_acc is not None:
                stats_acc.add(
                    {pid: (n_docs, sum_doclen, n_postings, int((time.time() - t0) * 1000))}
                )
            yield pd.DataFrame(
                {
                    "kind": [np.int8(2)],
                    "pid": [np.int32(pid)],
                    "local_idx": [np.int64(n_docs)],
                    # sum_doclen rides in the free string column, so the
                    # no-accumulator path recovers ALL stats from kind=2
                    # rows alone (no second scan of the doc rows)
                    "term": [f"_metrics{_META_SEP}{sum_doclen}"],
                    "tf": [np.int64(n_postings)],
                    "doclen": [np.int64((time.time() - t0) * 1000)],
                }
            )

    return fn


PARTIAL_RUNS_SCHEMA = (
    "term string, bucket bigint, min_docid bigint, df bigint, cf bigint, "
    "doc_bytes binary, tf_bytes binary, dl_bytes binary"
)


def _flat_to_batch(pa, term_arr, buckets, f):
    """Assemble a POSTINGS_SCHEMA RecordBatch zero-copy from a
    codec.FlatEncodedRuns: binary columns reuse the contiguous byte
    streams via Array.from_buffers, list columns reuse the flat block
    vectors via ListArray.from_arrays — no per-run Python objects."""
    G = len(term_arr)
    bin_col = lambda offs, stream: pa.Array.from_buffers(  # noqa: E731
        pa.binary(), G,
        [None, pa.py_buffer(offs.astype(np.int32)), pa.py_buffer(stream)],
    )
    lists32 = lambda vals: pa.ListArray.from_arrays(  # noqa: E731
        pa.array(f.cum_nb.astype(np.int32)), pa.array(vals)
    )
    return pa.RecordBatch.from_arrays(
        [
            term_arr,
            pa.array(buckets, type=pa.int64()),
            pa.array(f.lens, type=pa.int64()),
            pa.array(f.cfs, type=pa.int64()),
            bin_col(f.run_offs_d, f.stream_d),
            bin_col(f.run_offs_t, f.stream_t),
            lists32(f.offs_d),
            lists32(f.offs_t),
            pa.ListArray.from_arrays(
                pa.array(f.cum_nb.astype(np.int32)),
                pa.array(f.block_last, type=pa.int64()),
            ),
            lists32(f.block_max_tf),
            lists32(f.block_min_dl),
        ],
        names=[
            "term", "bucket", "df", "cf", "doc_bytes", "tf_bytes",
            "block_offs_doc", "block_offs_tf", "block_last",
            "block_max_tf", "block_min_dl",
        ],
    )


def _strip_file_scheme(path: str) -> str:
    """file:-scheme URIs (Spark's input_file_name form) -> local paths;
    other schemes pass through for pyarrow.fs to resolve."""
    if path.startswith("file://"):
        return path[7:]
    if path.startswith("file:"):
        return path[5:]
    return path


def _partial_runs_fn(offsets: dict, bucket_docs: int):
    """mapInArrow closure over STAGED FILE PATHS (one row per staging
    parquet file): each task reads its file(s) DIRECTLY with pyarrow's
    C++ parquet reader — the posting triples never cross the JVM→Python
    row pipe, which profiling showed costs ~20 s for ~50 M rows while the
    direct columnar read costs ~0.5 s — and emits per-partition sorted
    partial posting runs, one row per (term, bucket) present in the file:
    docid-delta varint streams exactly like the final format (base =
    bucket * bucket_docs) plus a varint doclen stream, with min_docid
    for the reduce-side merge order. This is the north-star shape:
    per-partition sorted posting lists built map-side, merged by a
    sorted-merge shuffle keyed (term, bucket) in stage 3b. Staging must
    live on a filesystem pyarrow can open (local/NFS/S3/HDFS via
    pyarrow.fs — true for Spark-writable storage in this deployment).

    ``offsets`` (pid -> global docid offset) is a small broadcast-by-
    closure dict; memory per task is bounded by one stage-1 partition's
    triples (the same bound the old reduce-side encode had)."""
    import pyarrow as pa

    from .codec import _varint_sizes, varint_encode

    max_pid = max(offsets) if offsets else 0
    off_lookup = np.zeros(max_pid + 1, dtype=np.int64)
    for p, o in offsets.items():
        off_lookup[p] = o

    def fn(batches):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        for b in batches:
            for path in b.column(0).to_pylist():
                # use_threads=False: Spark owns the parallelism here (one
                # task per file, all cores busy). pyarrow's default pool
                # spawns cpu_count decode threads PER concurrent task —
                # measured 1.8x slower at 4 parallel tasks on 4 cores
                # (thread thrash), and it inverts the N-vs-4N scaling
                # signal (3a speedup 2.0x -> 3.9x on 4 cores with the
                # pool disabled).
                tbl = pq.read_table(
                    _strip_file_scheme(path),
                    columns=["pid", "local_idx", "term", "tf", "doclen"],
                    filters=[("kind", "=", 1)],
                    use_threads=False,
                ).combine_chunks()
                n = tbl.num_rows
                if n == 0:
                    continue
                pid = tbl.column("pid").to_numpy()
                local = tbl.column("local_idx").to_numpy()
                term = tbl.column("term")
                term = term.chunk(0) if isinstance(term, pa.ChunkedArray) else term
                tf = tbl.column("tf").to_numpy()
                dl = tbl.column("doclen").to_numpy()
                docid = off_lookup[pid] + local
                # group sort: dictionary codes stand in for the term (the
                # global term order is imposed by stage 3b's range
                # exchange, so code order — not lexicographic order — is
                # fine here and skips a string sort); bucket is monotonic
                # in docid, so (code, docid) fully orders (term, bucket)
                codes = term.dictionary_encode().indices.to_numpy()
                # single-key argsort beats np.lexsort (two stable merge
                # passes over ~100MB of gather traffic) when (code,
                # docid) packs into one int64: (code, docid) pairs are
                # unique (stage 1 emits one triple per term x doc), so
                # an unstable sort of the packed key gives the same
                # order with roughly half the memory traffic — this is
                # the bandwidth-bound hot loop of the map side, and the
                # contended multi-task arm gains the most. Falls back to
                # lexsort when the key would overflow (docid ranges past
                # 2^62 / vocab — not reachable before int64 docids are).
                span = int(docid.max()) + 1 if n else 1
                ncodes = int(codes.max()) + 1 if n else 1
                if ncodes * span < (1 << 62):
                    order = np.argsort(
                        codes.astype(np.int64) * span + docid, kind="quicksort"
                    )
                else:
                    order = np.lexsort((docid, codes))
                codes_s = codes[order]
                docid_s = docid[order]
                bucket_s = docid_s // bucket_docs
                tf_s = tf[order].astype(np.int64)
                dl_s = dl[order].astype(np.int64)
                change = np.empty(n, dtype=bool)
                change[0] = True
                change[1:] = (codes_s[1:] != codes_s[:-1]) | (
                    bucket_s[1:] != bucket_s[:-1]
                )
                starts = np.flatnonzero(change)
                ends = np.append(starts[1:], n)
                boundaries = np.append(starts, n)
                G = len(starts)

                deltas = np.empty(n, dtype=np.uint64)
                if n > 1:
                    np.subtract(
                        docid_s[1:], docid_s[:-1], out=deltas[1:], casting="unsafe"
                    )
                deltas[starts] = (
                    docid_s[starts] - bucket_s[starts] * bucket_docs
                ).astype(np.uint64)
                tf_enc = (tf_s - 1).astype(np.uint64)
                dl_enc = dl_s.astype(np.uint64)

                streams, offs = [], []
                for vals in (deltas, tf_enc, dl_enc):
                    sizes = _varint_sizes(vals)
                    cum = np.zeros(n + 1, dtype=np.int64)
                    np.cumsum(sizes, out=cum[1:])
                    streams.append(varint_encode(vals, sizes=sizes))
                    offs.append(cum[boundaries])

                bin_col = lambda i: pa.Array.from_buffers(  # noqa: E731
                    pa.binary(), G,
                    [None, pa.py_buffer(offs[i].astype(np.int32)),
                     pa.py_buffer(streams[i])],
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        pc.take(term, pa.array(order[starts])),
                        pa.array(bucket_s[starts], type=pa.int64()),
                        pa.array(docid_s[starts], type=pa.int64()),
                        pa.array(ends - starts, type=pa.int64()),
                        pa.array(np.add.reduceat(tf_s, starts), type=pa.int64()),
                        bin_col(0),
                        bin_col(1),
                        bin_col(2),
                    ],
                    names=[
                        "term", "bucket", "min_docid", "df", "cf",
                        "doc_bytes", "tf_bytes", "dl_bytes",
                    ],
                )

    return fn


def _binary_stream(pa, arr):
    """View an Arrow binary column as (data uint8, row byte offsets int64)
    — row i's bytes are data[offs[i]:offs[i+1]]; rows are back-to-back,
    so data[offs[0]:offs[-1]] is the concatenation of every row."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    return data, offs


def _merge_runs_arrow(bucket_docs: int, enc_acc=None, chunk_rows: int = 256 * 1024):
    """mapInArrow closure for stage 3b: the reduce side of the sorted-merge
    shuffle. Input rows are partial runs (PARTIAL_RUNS_SCHEMA) range-
    partitioned on (term, bucket) and sorted by (term, bucket, min_docid)
    within the partition, so each (term, bucket) group's runs arrive
    contiguous and in docid order (map tasks own disjoint docid ranges,
    so runs never interleave). The whole chunk is decoded in ONE
    vectorized varint pass (the three streams are back-to-back in the
    Arrow value buffers), docids are rebased with a segmented cumsum, and
    the merged runs are re-encoded with codec.encode_posting_runs_flat —
    byte-identical to encoding the raw triples directly, at a shuffle
    cost of ~compressed-postings bytes instead of ~raw-triple rows."""
    import pyarrow as pa

    from .codec import encode_posting_runs_flat, varint_decode

    def fn(batches):
        import pyarrow.compute as pc

        carry: tuple | None = None  # (term pa.Array, bucket, min_docid, df, cf, 3×(data, offs))
        pend: list = []
        pend_rows = 0

        def drain(final: bool):
            nonlocal carry, pend, pend_rows
            if carry is None and not pend:
                return None
            col = lambda b, name: b.column(b.schema.get_field_index(name))  # noqa: E731
            term = pa.concat_arrays(
                ([carry[0]] if carry is not None else [])
                + [col(b, "term") for b in pend]
            )
            nums = {}
            for i, name in enumerate(("bucket", "min_docid", "df", "cf")):
                nums[name] = np.concatenate(
                    ([carry[1 + i]] if carry is not None else [])
                    + [col(b, name).to_numpy() for b in pend]
                ) if len(term) else np.empty(0, np.int64)
            bins = {}
            for j, name in enumerate(("doc_bytes", "tf_bytes", "dl_bytes")):
                parts = ([carry[5 + j]] if carry is not None else []) + [
                    _binary_stream(pa, col(b, name)) for b in pend
                ]
                datas = [d[o[0] : o[-1]] for d, o in parts]
                offs = [o - o[0] for _, o in parts]
                base = np.cumsum([0] + [d.size for d in datas[:-1]])
                bins[name] = (
                    np.concatenate(datas) if datas else np.empty(0, np.uint8),
                    np.concatenate(
                        [offs[0]] + [o[1:] + b for o, b in zip(offs[1:], base[1:])]
                    ) if datas else np.zeros(1, np.int64),
                )
            pend, pend_rows = [], 0
            carry = None
            R = len(term)
            if R == 0:
                return None
            bucket = nums["bucket"]
            change = np.empty(R, dtype=bool)
            change[0] = True
            if R > 1:
                tdiff = pc.not_equal(term.slice(1), term.slice(0, R - 1)).to_numpy(
                    zero_copy_only=False
                )
                change[1:] = tdiff | (bucket[1:] != bucket[:-1])
            gstarts = np.flatnonzero(change)
            if not final:
                if len(gstarts) <= 1:
                    carry = (
                        term, bucket, nums["min_docid"], nums["df"], nums["cf"],
                        bins["doc_bytes"], bins["tf_bytes"], bins["dl_bytes"],
                    )
                    return None
                cut = int(gstarts[-1])
                cut_bins = {}
                for name in ("doc_bytes", "tf_bytes", "dl_bytes"):
                    d, o = bins[name]
                    cut_bins[name] = (d[: o[cut]], o[: cut + 1])
                    bins[name] = (d[o[cut] :], o[cut:] - o[cut])
                carry = (
                    term.slice(cut), bucket[cut:], nums["min_docid"][cut:],
                    nums["df"][cut:], nums["cf"][cut:],
                    bins["doc_bytes"], bins["tf_bytes"], bins["dl_bytes"],
                )
                term = term.slice(0, cut)
                bucket = bucket[:cut]
                for name in ("df", "cf", "min_docid"):
                    nums[name] = nums[name][:cut]
                bins = cut_bins
                gstarts = gstarts[:-1]
                R = cut
            df = nums["df"]
            vstarts = np.zeros(R + 1, dtype=np.int64)
            np.cumsum(df, out=vstarts[1:])

            d_data, _ = bins["doc_bytes"]
            t_data, _ = bins["tf_bytes"]
            l_data, _ = bins["dl_bytes"]
            d = varint_decode(d_data).astype(np.int64)
            tfs = varint_decode(t_data).astype(np.int64) + 1
            dls = varint_decode(l_data).astype(np.int64)
            # segmented docid reconstruction: within run r the deltas
            # chain from base_r + first_delta; a single global cumsum plus
            # a per-run correction (repeated across the run) rebases all
            # runs at once
            first_abs = d[vstarts[:-1]] + bucket * bucket_docs
            c = np.cumsum(d)
            corr = np.repeat(first_abs - c[vstarts[:-1]], df)
            docids = c + corr

            gends = np.append(gstarts[1:], R)
            f = encode_posting_runs_flat(
                docids, tfs, dls,
                vstarts[gstarts], vstarts[gends],
                bucket[gstarts] * bucket_docs,
            )
            if enc_acc is not None:
                enc_acc.add(
                    {0: (len(gstarts), int(f.stream_d.size + f.stream_t.size))}
                )
            return _flat_to_batch(
                pa, pc.take(term, pa.array(gstarts)), bucket[gstarts], f
            )

        for b in batches:
            if b.num_rows == 0:
                continue
            pend.append(b)
            pend_rows += b.num_rows
            if pend_rows + (len(carry[1]) if carry is not None else 0) >= chunk_rows:
                out = drain(final=False)
                if out is not None:
                    yield out
        out = drain(final=True)
        if out is not None:
            yield out

    return fn


def _encode_partition_arrow(bucket_docs: int, enc_acc=None, chunk_rows: int = 512 * 1024):
    """mapInArrow closure: vectorized posting-run encoder over PRESORTED
    input — the upstream exchange must be
    ``repartitionByRange(P, "term", "bucket").sortWithinPartitions("term",
    "bucket", "docid")`` so the sort happens JVM-side (Tungsten radix
    sort, parallel and spill-capable) and groups arrive contiguous.

    The Python side is then a pure streaming group-detector + ONE numpy
    varint pass per ~chunk_rows rows (codec.encode_posting_runs_flat),
    with the output RecordBatch assembled zero-copy from the flat arrays:
    the binary columns reuse the contiguous byte streams via
    Array.from_buffers and the block-metadata list columns reuse the flat
    block vectors via ListArray.from_arrays — no per-run Python objects
    at all (the reference's DocumentsWriterPerThread flush writes its
    postings in one sequential pass the same way;
    lucene/core/.../index/FreqProxTermsWriter). Memory stays bounded at
    ~chunk_rows triples regardless of partition size; the carried tail
    (an unfinished (term,bucket) group) is ≤ bucket_docs rows by
    construction."""
    import pyarrow as pa

    from .codec import encode_posting_runs_flat

    def fn(batches):
        import pyarrow.compute as pc

        carry: tuple | None = None  # (term pa.Array, docid, tf, doclen, bucket)
        pend: list = []
        pend_rows = 0

        def drain(final: bool):
            nonlocal carry, pend, pend_rows
            if carry is None and not pend:
                return None
            terms_parts = ([carry[0]] if carry is not None else []) + [
                b.column(b.schema.get_field_index("term")) for b in pend
            ]
            np_parts = lambda name, i: ([carry[i]] if carry is not None else []) + [  # noqa: E731
                b.column(b.schema.get_field_index(name)).to_numpy() for b in pend
            ]
            term = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in terms_parts])
            docid = np.concatenate(np_parts("docid", 1)) if terms_parts else np.empty(0, np.int64)
            tf = np.concatenate(np_parts("tf", 2)) if terms_parts else np.empty(0, np.int64)
            doclen = np.concatenate(np_parts("doclen", 3)) if terms_parts else np.empty(0, np.int64)
            bucket = np.concatenate(np_parts("bucket", 4)) if terms_parts else np.empty(0, np.int64)
            pend, pend_rows = [], 0
            carry = None
            n = len(term)
            if n == 0:
                return None
            change = np.empty(n, dtype=bool)
            change[0] = True
            if n > 1:
                tdiff = pc.not_equal(term.slice(1), term.slice(0, n - 1)).to_numpy(
                    zero_copy_only=False
                )
                change[1:] = tdiff | (bucket[1:] != bucket[:-1])
            starts = np.flatnonzero(change)
            if not final:
                if len(starts) <= 1:
                    # one unfinished group: keep accumulating (≤ bucket_docs rows)
                    carry = (term, docid, tf, doclen, bucket)
                    return None
                cut = int(starts[-1])
                carry = (
                    term.slice(cut),
                    docid[cut:], tf[cut:], doclen[cut:], bucket[cut:],
                )
                term = term.slice(0, cut)
                docid, tf, doclen, bucket = (
                    docid[:cut], tf[:cut], doclen[:cut], bucket[:cut],
                )
                starts = starts[:-1]
                n = cut
            ends = np.append(starts[1:], n)
            f = encode_posting_runs_flat(
                docid.astype(np.int64), tf.astype(np.int64),
                doclen.astype(np.int64), starts, ends,
                bucket[starts] * bucket_docs,
            )
            if enc_acc is not None:
                enc_acc.add(
                    {0: (len(starts), int(f.stream_d.size + f.stream_t.size))}
                )
            return _flat_to_batch(
                pa, pc.take(term, pa.array(starts, type=pa.int64())),
                bucket[starts], f,
            )

        for b in batches:
            if b.num_rows == 0:
                continue
            pend.append(b)
            pend_rows += b.num_rows
            if pend_rows + (len(carry[1]) if carry is not None else 0) >= chunk_rows:
                out = drain(final=False)
                if out is not None:
                    yield out
        out = drain(final=True)
        if out is not None:
            yield out

    return fn


def write_bucket_stats(docs_df: DataFrame, out_path: str, P: int,
                       first_id_col: str = "repo") -> None:
    """Stage 2b writer: one row per docid bucket with doclen/id/lang as
    position-indexed arrays (shared by build_index and segment merge so
    the layout cannot desynchronize)."""
    (
        docs_df.groupBy("bucket")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "docid", "doclen", F.col(first_id_col).alias("repo"), "lang"
                    )
                )
            ).alias("a")
        )
        .select(
            "bucket",
            F.transform("a", lambda x: x["doclen"]).alias("doclens"),
            F.transform("a", lambda x: x["repo"]).alias("repos"),
            F.transform("a", lambda x: x["lang"]).alias("langs"),
        )
        .repartitionByRange(max(P // 4, 1), "bucket")
        .sortWithinPartitions("bucket")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def write_term_stats(postings_df: DataFrame, out_path: str, P: int) -> None:
    """Stage 4 writer: global (df, cf, n_buckets) per term, range-sorted
    (shared by build_index and segment merge). Alongside the stats table
    it writes ``<out_path>_rev``: the REVERSED term dictionary, range-
    sorted by the reversed form — the ReversedWildcardFilterFactory
    capability (reference text_general_rev fieldType;
    CORE/analysis/ReversedWildcardFilterFactory.java): a leading-wildcard
    query becomes a PREFIX scan on this table (parquet min/max row-group
    pruning applies) instead of a full dictionary LIKE scan. Cost ∝
    vocabulary (two narrow columns), negligible next to postings."""
    (
        postings_df.groupBy("term")
        .agg(
            F.sum("df").alias("df"),
            F.sum("cf").alias("cf"),
            F.count("*").alias("n_buckets"),
        )
        .repartitionByRange(max(P // 4, 1), "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    (
        spark_read_parquet_same_session(postings_df, out_path)
        .select(F.reverse(F.col("term")).alias("rev"), "term")
        .repartitionByRange(max(P // 8, 1), "rev")
        .sortWithinPartitions("rev")
        .write.mode("overwrite")
        .parquet(out_path + "_rev")
    )
    # bigram inverted index over the dictionary (one row per gram
    # OCCURRENCE — the occurrence count can only overcount the multiset
    # q-gram intersection, keeping the count-filter prefilter lossless;
    # see IndexMeta.terms_ngrams_path). Range-sorted by gram so the
    # query side's IN(<pattern grams>) prunes row groups. Cost ∝
    # vocabulary × avg term length — the same posture as terms_rev.
    (
        spark_read_parquet_same_session(postings_df, out_path)
        .select(
            "term",
            F.length("term").alias("tlen"),
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(term) - 1, 1)),"
                    " i -> substr(term, i, 2))"
                )
            ).alias("gram"),
        )
        .filter(F.length("gram") == 2)
        .select("gram", "term", "tlen")
        .repartitionByRange(max(P // 8, 1), "gram")
        .sortWithinPartitions("gram", "term")
        .write.mode("overwrite")
        .parquet(out_path + "_ngrams")
    )


def spark_read_parquet_same_session(df: DataFrame, path: str) -> DataFrame:
    """Read ``path`` with the session that produced ``df`` (write_term_stats
    is called with a DataFrame, not a session handle)."""
    return df.sparkSession.read.parquet(path)


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _accumulators_exact(spark: SparkSession) -> bool:
    """True iff accumulator updates inside transformations are exactly-once
    on this runtime: no task retries (maxFailures <= 1) and no speculative
    duplicates. Cluster masters default to maxFailures=4, so they fall
    back to the metrics-row scan (see _analyze_partitions docstring)."""
    conf = spark.sparkContext.getConf()
    master = conf.get("spark.master", "")
    max_failures = int(conf.get("spark.task.maxFailures", "1" if master.startswith("local") and "," not in master else "4"))
    speculation = conf.get("spark.speculation", "false").lower() == "true"
    return master.startswith("local") and max_failures <= 1 and not speculation


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    *,
    bucket_docs: int = DEFAULT_BUCKET_DOCS,
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    content_col: str = "content",
    num_partitions: int | None = None,
    overwrite: bool = False,
    resume: bool = True,
    docid_base: int = 0,
    bigrams: bool = False,
    analyzer: str = "code",
    synonyms: dict | None = None,
) -> IndexMeta:
    """Build the full index under ``out_dir``. Returns IndexMeta.

    ``docs`` must carry ``id_cols`` (unique composite key), ``content_col``,
    and optionally ``lang``. docid = docid_base + ordinal of the global
    (repo,path,commit) sort — content-independent and parallelism-invariant
    (SURVEY.md §7). ``docid_base`` is used by delta segments
    (segments.add_segment) and must be bucket-aligned so a docid bucket
    never spans two segments."""
    if docid_base % bucket_docs != 0:
        raise ValueError("docid_base must be a multiple of bucket_docs")
    if overwrite and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "meta.json")
    if resume and os.path.exists(meta_path):
        return IndexMeta.load(out_dir)

    P = num_partitions or spark.sparkContext.defaultParallelism
    stage_dir = os.path.join(out_dir, "_stage", "tokens")
    from .analysis import ANALYZERS, PRE_TRANSFORMS

    term_transform = ANALYZERS[analyzer]
    pre_transform = PRE_TRANSFORMS.get(analyzer)
    syn_graph = None
    if synonyms:
        from .analysis import SynonymGraph

        syn_graph = SynonymGraph(synonyms)
        synonyms = syn_graph.to_meta()  # canonical persisted form
    meta = IndexMeta(
        out_dir=out_dir, bucket_docs=bucket_docs, has_bigrams=bigrams,
        analyzer=analyzer, id_cols=list(id_cols),
        synonyms=synonyms or None,
    )
    cols = {c.lower() for c in docs.columns}
    lang_col = F.col("lang") if "lang" in cols else F.lit(None).cast("string")

    # ---- stage 1: analyze (single content scan) --------------------------
    t0 = time.time()
    stats_acc = spark.sparkContext.accumulator({}, _DictSumParam())
    ran_stage1 = not (resume and _done(stage_dir))
    if ran_stage1:
        src = docs.select(
            *[F.col(c) for c in id_cols], lang_col.alias("lang"),
            F.col(content_col).alias("content"),
        )
        sorted_docs = (
            src.repartitionByRange(P, *[F.col(c) for c in id_cols])
            .sortWithinPartitions(*id_cols)
            .withColumn("pid", F.spark_partition_id())
        )
        sorted_docs.mapInPandas(
            _analyze_partitions(
                stats_acc,
                bigrams=bigrams,
                term_transform=term_transform,
                id_cols=tuple(id_cols),
                synonyms=syn_graph,
                pre_transform=pre_transform,
            ),
            STAGE_SCHEMA,
        ).write.mode("overwrite").parquet(stage_dir)
    meta.stages["analyze"] = round(time.time() - t0, 3)

    stage = spark.read.parquet(stage_dir)

    # partition offsets -> global docid. Fresh runs on retry-free runtimes
    # get per-partition stats for free from the stage-1 accumulator;
    # resumed runs and retry-capable clusters re-derive them with one scan
    # of the staging metrics rows (kind=2), which are exactly-once.
    pstats = (
        dict(stats_acc.value)
        if ran_stage1 and _accumulators_exact(spark)
        else {}
    )
    if not pstats:
        metrics = stage.where(F.col("kind") == 2).collect()
        pstats = {}
        legacy_pids = []
        for r in metrics:
            parts = str(r["term"]).split(_META_SEP)
            sd = int(parts[1]) if len(parts) > 1 else -1
            pstats[int(r["pid"])] = (int(r["local_idx"]), sd, int(r["tf"]), int(r["doclen"]))
            if sd < 0:
                legacy_pids.append(int(r["pid"]))
        if legacy_pids:  # staging written by an older build: one extra scan
            sums = (
                stage.where(F.col("kind") == 0)
                .groupBy("pid")
                .agg(F.sum("doclen").alias("s"))
                .collect()
            )
            for r in sums:
                nd, _sd, np_, ms = pstats[int(r["pid"])]
                pstats[int(r["pid"])] = (nd, int(r["s"] or 0), np_, ms)
    offsets, acc = {}, docid_base
    for pid in sorted(pstats):
        offsets[pid] = acc
        acc += pstats[pid][0]
    meta.docid_base = docid_base
    meta.n_docs = acc - docid_base
    meta.sum_doclen = sum(v[1] for v in pstats.values())
    meta.avgdl = meta.sum_doclen / meta.n_docs if meta.n_docs else 0.0
    meta.lineage = [
        {"pid": pid, "n_docs": v[0], "n_postings": v[2], "millis": v[3]}
        for pid, v in sorted(pstats.items())
    ]
    offs_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "pid int, offset bigint"
        )
    )

    # ---- stage 2: doc_stats ----------------------------------------------
    t0 = time.time()
    docs_out = os.path.join(out_dir, "docs")
    if not (resume and _done(docs_out)):
        meta_parts = F.split(F.col("term"), _META_SEP)
        n_ids = len(id_cols)
        id_out = [meta_parts.getItem(i).alias(c) for i, c in enumerate(id_cols)]
        (
            stage.where(F.col("kind") == 0)
            .join(offs_df, "pid")
            .withColumn("docid", F.col("offset") + F.col("local_idx"))
            .withColumn("bucket", F.expr(f"docid DIV {bucket_docs}"))
            .select(
                "docid",
                "bucket",
                *id_out,
                meta_parts.getItem(n_ids).alias("lang"),
                meta_parts.getItem(n_ids + 1).alias("sha256"),
                "doclen",
            )
            # range layout on docid: each output file covers a contiguous
            # docid (=bucket) span, so the per-query bucket semi-join in
            # kernel.search prunes whole files via row-group min/max
            .repartitionByRange(max(P // 2, 1), "docid")
            .sortWithinPartitions("docid")
            .write.mode("overwrite")
            .parquet(docs_out)
        )
    meta.stages["doc_stats"] = round(time.time() - t0, 3)

    # ---- stage 2b: bucket_stats (packed per-bucket doc arrays) -----------
    # One row per docid bucket carrying doclen/repo/lang as arrays indexed
    # by local docid (docids are dense, so position == docid - base). The
    # query kernel cogroups postings with THIS table instead of per-row
    # doc_stats: the per-query exchange moves ~n_docs/bucket_docs packed
    # rows instead of n_docs individual rows — the docs-side shuffle that
    # dominated fts latency at scale (the reference's analog is docValues
    # column pages, SolrIndexSearcher.java:894-986).
    t0 = time.time()
    bs_out = os.path.join(out_dir, "bucket_stats")
    if not (resume and _done(bs_out)):
        write_bucket_stats(
            spark.read.parquet(docs_out), bs_out, P, first_id_col=id_cols[0]
        )
    meta.stages["bucket_stats"] = round(time.time() - t0, 3)

    # ---- stage 3: postings (term,bucket)-keyed sorted merge ---------------
    t0 = time.time()
    enc_acc = spark.sparkContext.accumulator({}, _DictSumParam())
    post_out = os.path.join(out_dir, "postings")
    ran_stage3 = not (resume and _done(post_out))
    if ran_stage3:
        # --- 3a: map-side partial posting runs (its own _SUCCESS-gated
        # checkpoint, so a killed build resumes past it). One task per
        # staging file; the triples are read with pyarrow directly — see
        # _partial_runs_fn for why the JVM→Python row pipe is avoided.
        runs_dir = os.path.join(out_dir, "_stage", "runs")
        if not (resume and _done(runs_dir)):
            files = (
                sorted(
                    os.path.join(stage_dir, f_)
                    for f_ in os.listdir(stage_dir)
                    if f_.endswith(".parquet")
                )
                if os.path.isdir(stage_dir)
                else []
            )
            if not files:  # non-local staging: list through Spark instead
                files = sorted(
                    r[0]
                    for r in stage.select(F.input_file_name()).distinct().collect()
                )
            paths_df = spark.createDataFrame(
                [(p,) for p in files], "path string"
            ).repartition(max(len(files), 1))  # round-robin: one file per task
            (
                paths_df.mapInArrow(
                    _partial_runs_fn(offsets, bucket_docs), PARTIAL_RUNS_SCHEMA
                )
                .write.mode("overwrite")
                .parquet(runs_dir)
            )
        meta.stages["postings_3a"] = round(time.time() - t0, 3)
        # --- 3b: sorted-merge shuffle keyed (term, bucket) over the
        # COMPACT runs (~postings-sized bytes, not raw-triple rows).
        # Range exchange: groups stay complete per partition AND each
        # postings file covers a contiguous term span, so a query term's
        # pruned scan touches one file (row-group min/max stats line up
        # with the sort); the range partitioner's sampling pass now scans
        # the small runs table, not the triples. Skew stays structural: a
        # term never exceeds bucket_docs postings per (term,bucket)
        # group, and a group never holds more runs than stage-1
        # partitions. The row sort rides the exchange JVM-side.
        runs = spark.read.parquet(os.path.join(out_dir, "_stage", "runs"))
        (
            runs.repartitionByRange(P, "term", "bucket")
            .sortWithinPartitions("term", "bucket", "min_docid")
            .mapInArrow(_merge_runs_arrow(bucket_docs, enc_acc), POSTINGS_SCHEMA)
            .write.mode("overwrite")
            .parquet(post_out)
        )
    meta.stages["postings"] = round(time.time() - t0, 3)

    postings = spark.read.parquet(post_out)

    # ---- stage 4: term_stats ----------------------------------------------
    t0 = time.time()
    terms_out = os.path.join(out_dir, "terms")
    if not (resume and _done(terms_out)):
        write_term_stats(postings, terms_out, P)
    meta.stages["term_stats"] = round(time.time() - t0, 3)

    # ---- stage 5: meta + lineage -------------------------------------------
    ts = spark.read.parquet(terms_out).agg(
        F.count("*").alias("n_terms"), F.max("df").alias("max_df"), F.avg("df").alias("mean_df")
    ).collect()[0]
    meta.n_terms = int(ts["n_terms"] or 0)
    meta.skew_max_df = int(ts["max_df"] or 0)
    meta.skew_ratio = float(ts["max_df"] / ts["mean_df"]) if ts["mean_df"] else 0.0
    if ran_stage3 and enc_acc.value:
        rows_bytes = enc_acc.value.get(0, (0, 0))
        meta.postings_rows = int(rows_bytes[0])
        meta.postings_bytes = int(rows_bytes[1])
    else:
        pb = postings.agg(
            F.count("*").alias("rows"),
            F.sum(F.length("doc_bytes") + F.length("tf_bytes")).alias("bytes"),
        ).collect()[0]
        meta.postings_rows = int(pb["rows"] or 0)
        meta.postings_bytes = int(pb["bytes"] or 0)
    meta.save()
    return meta


def verify_content_integrity(
    spark: SparkSession,
    meta: "IndexMeta",
    source: DataFrame,
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    content_col: str = "content",
) -> DataFrame:
    """Per-row content-sha256 invariant vs the source table (the north
    rule's row-level check; the reference's analog is Solr's index
    checksum verification, solr/core CheckIndex lifecycle).

    Recomputes sha256 over the source's content JVM-side and joins it to
    the doc store on the composite key — one co-partitioned join, no
    content ever collected. Returns a one-row frame
    (n_docs, n_matched, n_sha_mismatch, n_missing_in_index,
    n_missing_in_source); a clean build has n_docs == n_matched and
    zeros elsewhere."""
    docs = spark.read.parquet(meta.docs_path).select(*id_cols, "sha256")
    src = source.select(
        *id_cols, F.sha2(F.coalesce(F.col(content_col), F.lit("")), 256).alias("__sha")
    )
    j = docs.join(src, list(id_cols), "full_outer")
    return j.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("sha256") == F.col("__sha"), 1)).alias("n_matched"),
        F.count(
            F.when(
                F.col("sha256").isNotNull()
                & F.col("__sha").isNotNull()
                & (F.col("sha256") != F.col("__sha")),
                1,
            )
        ).alias("n_sha_mismatch"),
        F.count(F.when(F.col("sha256").isNull(), 1)).alias("n_missing_in_index"),
        F.count(F.when(F.col("__sha").isNull(), 1)).alias("n_missing_in_source"),
    )
