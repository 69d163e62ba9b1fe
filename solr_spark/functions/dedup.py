"""Deduplication operators for large-scale corpus curation.

Reference analogs (/root/reference/solr/):
- exact signature dedup: core/.../update/processor/SignatureUpdateProcessorFactory.java
  (Lookup3/MD5Signature over concatenated fields)
- MinHash: core/.../search/MinHashQParser.java (+ Lucene MinHashFilter)

Scale design (the part that matters at 100 TB):
- exact dedup is a single hash-aggregate on the fingerprint — one shuffle
  of (hash, id), never the content.
- n-gram Jaccard uses a shingle inverted index: explode → self-join on
  shingle → count shared shingles per pair. The shuffle is keyed by
  shingle; a hot shingle (shared by s docs) contributes s² pair rows, so
  production runs cap shingle df (``max_shingle_df``) — standard practice
  (identical shingles in >X% of docs carry no signal). With the cap the
  join is linear-ish in corpus size.
- MinHash-LSH replaces the exact index with b×r banded signatures:
  candidate generation is a groupBy on (band, band_hash) — constant
  signature size per doc regardless of doc length, and only candidate
  pairs are verified exactly. All signature math is JVM-side Catalyst
  (xxhash64 + transform + array_min) — no Python in the pipeline.
- SimHash is a vectorized Arrow UDF (numpy bit ops) + pigeonhole banding
  on 16-bit chunks for Hamming-distance candidates.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHINGLE_ROWS_SCHEMA = "id bigint, shingle string"


def shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Exploded DISTINCT (id, shingle) rows — the dedup pipelines' shared
    shingle source, fully vectorized in Arrow C++ (same kernel family as
    analysis.term_frequencies): lower → regex split → stop filter →
    n-gram join over zero-copy shifted slices → per-doc distinct via one
    int64 sort. No per-element Catalyst lambdas (a transform+slice
    expression is interpreted per element — measured ~50x slower).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..analysis import SPLIT_REGEX_SQL, STOPWORDS

    src = df.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(text_col).alias("text")
    )

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy(np.int64)
            arr = pa.Array.from_pandas(pdf["text"].fillna(""))
            toks = pc.split_pattern_regex(pc.utf8_lower(arr), SPLIT_REGEX_SQL)
            flat = pc.list_flatten(toks)
            parent = pc.list_parent_indices(toks)
            good = pc.and_(
                pc.not_equal(flat, ""),
                pc.invert(pc.is_in(flat, value_set=pa.array(sorted(STOPWORDS)))),
            )
            flat = pc.filter(flat, good)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            parent = pc.filter(parent, good).to_numpy().astype(np.int64)
            m = len(flat)
            if m < n:
                continue
            # n-gram positions: all i where tokens i..i+n-1 share a doc
            mask = parent[: m - n + 1] == parent[n - 1 :]
            if not mask.any():
                continue
            parts = [flat.slice(j, m - n + 1) for j in range(n)]
            grams = pc.binary_join_element_wise(*parts, " ")
            grams = pc.filter(grams, pa.array(mask))
            gdoc = parent[: m - n + 1][mask]
            # per-doc distinct: one combined-key sort
            denc = pc.dictionary_encode(grams)
            if isinstance(denc, pa.ChunkedArray):
                denc = denc.combine_chunks()
            codes = denc.indices.to_numpy().astype(np.int64)
            k = np.int64(len(denc.dictionary))
            key = np.unique(gdoc * k + codes)
            out_sh = pc.take(denc.dictionary, pa.array((key % k), type=pa.int32()))
            yield pd.DataFrame(
                {
                    "id": ids[(key // k)],
                    "shingle": pd.Series(pd.arrays.ArrowExtensionArray(out_sh)),
                }
            )

    return src.mapInPandas(kern, SHINGLE_ROWS_SCHEMA)


def shingles(toks: Column, n: int = 3) -> Column:
    """Token n-gram shingle array (distinct), pure Catalyst: for token
    array t, shingle i = concat_ws(' ', slice(t, i+1, n)). Docs shorter
    than n tokens yield an empty array (guarded — Spark's sequence()
    would otherwise run descending)."""
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup groups: one row per duplicated *content* value with the
    canonical (min) id, member count, and member ids. Grouping key is the
    raw text; for long documents swap in fingerprint() to shuffle 16-byte
    hashes instead of content (SignatureUpdateProcessorFactory semantics)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("sig"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_members"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
        )
        .filter(F.col("n_members") > 1)
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | str | None = "auto",
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (id_a < id_b,
    jaccard >= threshold) via a shingle inverted index — the exact
    counterpart the MinHash path is verified against.

    jaccard = |Sa ∩ Sb| / (|Sa| + |Sb| - |Sa ∩ Sb|) over DISTINCT shingles.

    max_shingle_df caps a shingle's document frequency before the
    self-join: a shingle shared by s docs emits s² pair rows, so one
    boilerplate shingle at 100 TB is a quadratic blowup. Default "auto"
    caps at max(64, 0.1% of corpus) — shingles that common carry no
    near-dup signal. Pass None to opt in to the uncapped exact join
    (verification at test scale only); the dropped-shingle count is
    exposed via jaccard_dropped_shingles() for pipeline logging.
    """
    from pyspark import StorageLevel

    inv = shingle_rows(df, id_col, text_col, n).persist(StorageLevel.MEMORY_AND_DISK)
    cached = inv  # released by callers via result._solr_spark_cached
    if max_shingle_df == "auto":
        n_docs = df.count()
        max_shingle_df = max(64, n_docs // 1000)
    if max_shingle_df is not None:
        hot = (
            inv.groupBy("shingle").count().filter(F.col("count") > max_shingle_df)
        )
        inv = inv.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    # sizes AFTER the cap: jaccard is exact over the retained shingle space
    sizes = inv.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        # sizes is one row per DOC — never force-broadcast an
        # O(n_docs) table (AQE still broadcasts when it is actually small)
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # pipelines calling this repeatedly should release the persisted
    # shingle run after materializing: out._solr_spark_cached.unpersist()
    out._solr_spark_cached = cached
    return out


def jaccard_dropped_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, max_shingle_df: int = 64
) -> DataFrame:
    """One-row DataFrame (n_dropped, max_df_seen): how many distinct
    shingles the jaccard_pairs df-cap removed — pipelines surface this so
    a silent cap never reads as full coverage."""
    dfreq = shingle_rows(df, id_col, text_col, n).groupBy("shingle").count()
    return dfreq.agg(
        F.count(F.when(F.col("count") > max_shingle_df, 1)).alias("n_dropped"),
        F.max("count").alias("max_df_seen"),
    )


AUTO_BUCKET_CAP = 512  # LSH band buckets larger than this are dropped whole


class _CacheHandle:
    """Releases every persisted frame a dedup pipeline pinned — callers
    keep the single-call contract ``result._solr_spark_cached.unpersist()``
    whether the pipeline pinned one frame or several."""

    def __init__(self, *frames):
        self._frames = [f for f in frames if f is not None]

    def unpersist(self):
        for f in self._frames:
            f.unpersist()
        return self


def _cap_buckets(banded: DataFrame, max_bucket_size: int | str | None) -> DataFrame:
    """Drop (band, bucket) groups with more than ``max_bucket_size``
    members from an LSH banding table (columns id, band, bucket), so the
    survivors' self-join is bounded at cap² rows per bucket.

    Implemented as a map-side-combined count of bucket sizes, filtered
    to the OVERSIZED buckets only (a handful of hot buckets by
    construction), broadcast back as an anti-join. This beats the
    window-count formulation: WindowExec must sort the whole banded
    table within partitions, while the anti-join streams it unsorted and
    the aggregate's exchange carries (band, bucket, count) rows — one
    per bucket, not one per member. Shared by the MinHash and SRP
    banding paths."""
    if max_bucket_size == "auto":
        max_bucket_size = AUTO_BUCKET_CAP
    if max_bucket_size is None:
        return banded
    oversized = (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__bsz"))
        .filter(F.col("__bsz") > int(max_bucket_size))
        .select("band", "bucket")
    )
    return banded.join(F.broadcast(oversized), ["band", "bucket"], "left_anti")


def lsh_oversized_buckets(
    banded: DataFrame, max_bucket_size: int = AUTO_BUCKET_CAP
) -> DataFrame:
    """One-row DataFrame (n_buckets_dropped, n_members_dropped,
    max_bucket_seen) over an LSH banding table — the pipeline-logging
    companion of the _cap_buckets drop (the jaccard_dropped_shingles
    pattern), so a capped run reports what it skipped."""
    sizes = banded.groupBy("band", "bucket").count()
    return sizes.agg(
        F.count(F.when(F.col("count") > max_bucket_size, 1)).alias(
            "n_buckets_dropped"
        ),
        F.coalesce(
            F.sum(F.when(F.col("count") > max_bucket_size, F.col("count"))),
            F.lit(0),
        ).alias("n_members_dropped"),
        F.max("count").alias("max_bucket_seen"),
    )


def minhash_signature(toks: Column, num_hashes: int = 64, shingle_n: int = 3) -> Column:
    """MinHash signature as array<bigint>[num_hashes], all JVM-side:
    h_i(doc) = min over shingles s of xxhash64(i, s). (MinHashQParser
    semantics; Lucene MinHashFilter uses the same min-of-hashes family.)

    NOTE: convenience column form for small frames only — nested
    higher-order functions are re-evaluated per downstream reference.
    The pipeline path (minhash_lsh_pairs) uses the explode + min-agg
    formulation instead, which is ~100x faster at scale."""
    sh = shingles(toks, shingle_n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(i, s))),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    verify: bool = True,
    max_bucket_size: int | str | None = "auto",
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, optionally verified with
    exact Jaccard (so precision is exact; recall is the LSH probability
    1-(1-t^r)^b). num_hashes = bands × rows_per_band.

    Pipeline: Arrow shingle kernel → signature via one hash-aggregate
    with num_hashes min() columns → explode bands → groupBy
    (band, band hash) buckets → candidate pairs → exact-Jaccard verify
    over the same shingle rows (inverted-index intersection counts).

    max_bucket_size caps a (band, bucket)'s membership before the
    self-join: a bucket with s members emits s²/2 candidate rows, and a
    giant EXACT-dup cluster (common in web corpora — boilerplate pages,
    mirrored files) puts its whole cluster in the same bucket of every
    band, turning one reducer quadratic. Buckets over the cap are
    dropped whole ("auto" = 512 — a >512-member near-identical cluster
    is exact-dup territory; run exact_duplicates() first and dedup its
    canonical survivors here). Pass None for the uncapped join (the
    test-scale oracle path); lsh_oversized_buckets() exposes the dropped
    bucket/member counts so a silent cap never reads as full coverage.
    """
    from pyspark import StorageLevel

    if num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes} "
            "(num_hashes = bands x rows_per_band)"
        )
    r = num_hashes // bands
    # the shingle table feeds the signature agg, the candidate verify and
    # the size agg — persist it once instead of re-running the Arrow
    # tokenize+shingle kernel 3-4x (at 100 TB you'd materialize this to
    # parquet; memory-and-disk is the single-job equivalent)
    inv = shingle_rows(df, id_col, text_col, shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sig = inv.groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"h{b * r + j}") for j in range(r)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    # persist the banding table: the bucket-size aggregate (cap), the
    # anti-join probe AND both sides of the candidate self-join consume
    # it — unpersisted, each re-runs the num_hashes-column min()
    # signature aggregation (measured 2x wall on the sf0.1 bench).
    # (id, band, bucket) is ~bands rows/doc of 20 bytes — tiny next to
    # the shingle table already pinned above.
    banded_pinned = banded.persist(StorageLevel.MEMORY_AND_DISK)
    banded = _cap_buckets(banded_pinned, max_bucket_size)
    x = banded.alias("x")
    y = banded.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if not verify:
        cand._solr_spark_cached = _CacheHandle(inv, banded_pinned)
        return cand
    # the candidate set is consumed 3x below (both arms of the id union
    # + the final verify join) — persist it (tiny by construction: LSH
    # candidates, not the corpus) so the banded self-join with its cap
    # subtree runs once, not three times
    cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
    cached = _CacheHandle(inv, banded_pinned, cand)
    # exact verify restricted to candidate ids: inverted-index
    # intersection counts (same math as jaccard_pairs / the SQL oracle)
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .unionByName(cand.select(F.col("id_b").alias("id")))
        .dropDuplicates(["id"])
    )
    inv_c = inv.join(F.broadcast(cand_ids), "id", "left_semi")
    sizes = inv_c.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = inv_c.alias("a")
    b = inv_c.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        cand.join(inter, ["id_a", "id_b"], "inner")
        .join(F.broadcast(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a")), "id_a")
        .join(F.broadcast(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # release with out._solr_spark_cached.unpersist() after materializing
    out._solr_spark_cached = cached
    return out


_SIMHASH_SCHEMA = "id bigint, simhash bigint"


def simhash_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document, entirely JVM-side Catalyst (no Python
    in the pipeline): explode analyzed tokens, hash each token instance
    with xxhash64, let every instance vote ±1 on each of the 64 bits
    (token with tf k votes k times — instance-level voting ≡ tf-weighted
    voting), pack sign bits with bitwise OR.

    Scale shape: ONE shuffle keyed by id, and map-side partial
    aggregation collapses the exploded token rows to (id × 64 counters)
    before the exchange — the wire carries ~one row per doc regardless of
    doc length. Mirrors the MinHash signature aggregation pattern."""
    from .textfn import tokens

    src = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        tokens(F.col(text_col)).alias("toks"),
    # token-less docs (null/whitespace/stopword-only text) carry no
    # signal and would all collapse to simhash=0 — every pair of them a
    # false hamming-0 "duplicate" and one quadratic hot bucket. Exclude
    # them, matching the jaccard/minhash pipelines.
    ).filter(F.size("toks") > 0)
    inst = src.select("id", F.explode("toks").alias("term")).withColumn(
        "h", F.xxhash64(F.col("term"))
    )
    votes = inst.groupBy("id").agg(
        *[
            F.sum(
                F.shiftrightunsigned(F.col("h"), i)
                .bitwiseAND(F.lit(1))
                .cast("bigint")
                * 2
                - 1
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    packed = F.lit(0).cast("bigint")
    for i in range(64):
        packed = packed.bitwiseOR(
            F.when(
                F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("bigint"), i)
            ).otherwise(F.lit(0).cast("bigint"))
        )
    sig = votes.select("id", packed.alias("simhash"))
    # zero-token docs vanish in the explode; restore them with simhash=0
    # (all votes zero -> all bits 0), matching the dense-per-doc contract
    return (
        src.select("id")
        .join(sig, "id", "left")
        .select("id", F.coalesce(F.col("simhash"), F.lit(0).cast("bigint")).alias("simhash"))
    )


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance <= max_hamming.
    Candidate generation by pigeonhole banding: split the 64-bit hash into
    ``max_hamming+1`` chunks; any pair within the distance budget shares
    at least one exact chunk → groupBy (chunk_idx, chunk_value) buckets,
    then exact popcount verify. One shuffle keyed by 16-bit chunks."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    sh = simhash_table(df, id_col, text_col)
    chunked = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned("simhash", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", "c.chunk", "c.val")
    a = chunked.alias("a")
    b = chunked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def duplicate_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Connected components over a near-duplicate pair graph → duplicate
    CLUSTERS with a canonical representative (the min id). Pairs is any
    pair table this module produces (jaccard_pairs / minhash_lsh_pairs /
    simhash_near_pairs / similarity.brute_force_pairs).

    This is the step production dedup needs beyond pairwise output: keep
    one doc per component, drop the rest. Algorithm: min-label
    propagation to fixpoint — each iteration joins every node's current
    label against its neighbors' and keeps the min (the standard
    large-graph connected-components shape; converges in O(component
    diameter) iterations, each one key-partitioned shuffle, lineage
    truncated per round like graph_expand). Near-dup components are
    star/clique-like, so 2-4 iterations in practice.

    Returns (id, cluster_id, is_canonical) for every node that appears
    in at least one pair; singleton docs never enter the pair table and
    need no row (they are their own cluster by definition)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("label"))
        .select(F.col("src").alias("id"), "label")
    )
    while True:
        # neighbor labels: for each edge, the dst's current label
        neigh = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        updated = (
            labels.join(neigh.withColumnRenamed("src", "id"), "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "new_label"
                ),
                "label",
            )
        ).localCheckpoint(eager=True)
        changed = updated.filter(F.col("new_label") < F.col("label")).count()
        labels = updated.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels.select(
        "id",
        F.col("label").alias("cluster_id"),
        (F.col("id") == F.col("label")).alias("is_canonical"),
    )
