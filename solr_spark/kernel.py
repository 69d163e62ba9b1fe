"""Distributed top-k BM25 query execution over the bucketed index.

The Spark shape of the reference's two-phase distributed search
(solr/core/src/java/org/apache/solr/handler/component/QueryComponent.java:747-1087):

  stage 1  parquet scan of postings WHERE term IN (query terms) — term-sorted
           layout makes this a pruned scan (predicate pushdown + row-group
           stats), the analog of the term-dictionary seek
  stage 2  per-bucket scoring kernel (cogroup postings x doc_stats by docid
           bucket): numpy dense scatter-add of BM25 contributions, posting
           intersection with block skipping for conjunctions, block-max
           pruning for single-term queries (the reference's WAND path,
           SolrIndexSearcher.java:1786 minNumFound -> Lucene BMW)
  stage 3  per-bucket top-k heaps -> global orderBy(score desc, docid).limit(k)
           (Spark TakeOrdered == mergeIds' ShardFieldSortedHitQueue,
           QueryComponent.java:879-914)
  stage 4  (optional) join winners back to doc_stats for stored fields —
           the reference's second PURPOSE_GET_FIELDS phase, so content-sized
           columns never ride the scoring path

Exactness contract: results (docids AND float64 scores) are identical with
pruning on or off, at any parallelism — tested in tests/test_kernel.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .codec import decode_blocks, decode_postings
from .indexer import IndexMeta, _done
from .qparser import Query, parse
from .scoring import idf as idf_fn
from .scoring import tfnorm

RESULT_SCHEMA = "docid bigint, score double"


# filter field -> packed array column in bucket_stats
_PACKED_FILTER_COLS = {"lang": "langs", "repo": "repos"}


def _bucket_kernel(
    idfs: dict[str, float],
    weights: dict[str, int],
    required: list[str],
    prohibited: list[str],
    filters: dict[str, list[str]],
    avgdl: float,
    bucket_docs: int,
    k: int,
    prune: bool,
    packed: bool = False,
    required_groups: list[list[str]] | None = None,
):
    """Build the per-bucket cogrouped scoring function (pure numpy inside).

    ``packed``: the docs side is the bucket_stats table (one row per
    bucket, doclen/filter columns as position-indexed arrays) instead of
    per-row doc stats — see indexer stage 2b.

    ``required_groups``: MUST groups (each = "match >= 1 of these
    terms") — the SynonymQuery-in-MUST shape. When present, the matching
    mask requires every group satisfied; the conjunction prune path is
    disabled upstream for non-singleton groups."""
    scoring_terms = sorted(weights)          # fixed order -> deterministic fp sums
    req_set = set(required)
    n_req = len(req_set)
    proh_set = set(prohibited)
    groups = required_groups or []
    # term -> indices of the groups it can satisfy
    term_groups: dict[str, list[int]] = {}
    for gi, g in enumerate(groups):
        for t in g:
            term_groups.setdefault(t, []).append(gi)

    def kern(post_pdf: pd.DataFrame, docs_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"docid": np.array([], np.int64), "score": np.array([], np.float64)})
        if len(post_pdf) == 0 or len(docs_pdf) == 0:
            return empty
        bucket = int(post_pdf["bucket"].iloc[0])
        base = bucket * bucket_docs
        B = bucket_docs

        dl = np.zeros(B, dtype=np.float64)
        alive = np.zeros(B, dtype=bool)
        if packed:
            row = docs_pdf.iloc[0]
            dls = np.asarray(row["doclens"], dtype=np.float64)
            nloc = len(dls)
            dl[:nloc] = dls
            ok = np.ones(nloc, dtype=bool)
            for f_name, vals in filters.items():
                arr = np.asarray(row[_PACKED_FILTER_COLS[f_name]], dtype=object)
                ok &= np.isin(arr, np.asarray(vals, dtype=object))
            alive[:nloc] = ok
        else:
            loc_docs = docs_pdf["docid"].to_numpy(np.int64) - base
            dl[loc_docs] = docs_pdf["doclen"].to_numpy(np.float64)
            ok = np.ones(len(docs_pdf), dtype=bool)
            for f_name, vals in filters.items():
                ok &= docs_pdf[f_name].isin(vals).to_numpy()
            alive[loc_docs[ok]] = True

        rows = {r["term"]: r for _, r in post_pdf.iterrows()}

        # prohibited terms only kill candidates
        for t in proh_set:
            r = rows.get(t)
            if r is not None:
                d, _ = decode_postings(r["doc_bytes"], r["tf_bytes"], int(r["df"]), base)
                alive[d - base] = False

        scores = np.zeros(B, dtype=np.float64)
        matched = np.zeros(B, dtype=bool)
        req_count = np.zeros(B, dtype=np.int16)
        grp_hit = np.zeros((B, len(groups)), dtype=bool) if groups else None

        if prune and n_req == 0 and len(scoring_terms) == 1:
            t = scoring_terms[0]
            r = rows.get(t)
            if r is None:
                return empty
            _score_single_pruned(r, t, idfs, weights, avgdl, base, dl, alive, scores, matched, k)
        elif prune and n_req >= 2 and n_req == len(scoring_terms):
            done = _score_conjunction_pruned(
                rows, scoring_terms, idfs, weights, avgdl, base, dl, scores, matched, req_count
            )
            if not done:
                return empty
        else:
            for t in scoring_terms:
                r = rows.get(t)
                if r is None:
                    continue
                d, tf = decode_postings(r["doc_bytes"], r["tf_bytes"], int(r["df"]), base)
                loc = d - base
                w = weights[t] * idfs[t]
                scores[loc] += w * tfnorm(tf, dl[loc], avgdl)
                matched[loc] = True
                if t in req_set:
                    req_count[loc] += 1
                if grp_hit is not None:
                    for gi in term_groups.get(t, ()):
                        grp_hit[loc, gi] = True

        if grp_hit is not None:
            mask = alive & matched & grp_hit.all(axis=1)
        elif n_req:
            mask = alive & (req_count == n_req)
        else:
            mask = alive & matched
        cand = np.flatnonzero(mask)
        if cand.size == 0:
            return empty
        sc = scores[cand]
        # exact local top-k with (score desc, docid asc); cand.size <= bucket_docs
        sel = np.lexsort((cand, -sc))[:k]
        return pd.DataFrame(
            {"docid": (cand[sel] + base).astype(np.int64), "score": sc[sel]}
        )

    return kern


def _score_single_pruned(r, t, idfs, weights, avgdl, base, dl, alive, scores, matched, k):
    """Single-term block-max pruning: decode blocks in descending bound
    order, stop once the kth-best exact score beats the next block bound.
    Exact because a skipped block's every posting is <= its bound."""
    w = weights[t] * idfs[t]
    max_tf = np.asarray(r["block_max_tf"], dtype=np.float64)
    min_dl = np.asarray(r["block_min_dl"], dtype=np.float64)
    bounds = w * tfnorm(max_tf, min_dl, avgdl)
    order = np.argsort(-bounds, kind="stable")
    offs_d = np.asarray(r["block_offs_doc"], dtype=np.int64)
    offs_t = np.asarray(r["block_offs_tf"], dtype=np.int64)
    last = np.asarray(r["block_last"], dtype=np.int64)
    df = int(r["df"])
    keep = np.zeros(len(order), dtype=bool)
    heap_scores: list[float] = []
    decoded = 0
    for bi in order:
        # strict <: a block bound EQUAL to the kth score may hold an
        # equal-score doc with a smaller docid, which wins the
        # (score desc, docid asc) tie — skipping it would break the
        # pruned == unpruned exactness contract
        if len(heap_scores) >= k and bounds[bi] < heap_scores[k - 1]:
            break
        keep[:] = False
        keep[bi] = True
        d, tf = decode_blocks(
            r["doc_bytes"], r["tf_bytes"], offs_d, offs_t, df, base, keep, last
        )
        loc = d - base
        contrib = w * tfnorm(tf, dl[loc], avgdl)
        scores[loc] += contrib
        matched[loc] = True
        decoded += 1
        live = contrib[alive[loc]]
        heap_scores = sorted(heap_scores + live.tolist(), reverse=True)[: k]


def _score_conjunction_pruned(
    rows, terms, idfs, weights, avgdl, base, dl, scores, matched, req_count
) -> bool:
    """Pure-AND path: galloping posting-list intersection with block
    skipping. Decode the rarest term fully; for each further term decode
    only blocks whose docid range intersects surviving candidates."""
    infos = []
    for t in terms:
        r = rows.get(t)
        if r is None:
            return False  # a required term absent from bucket -> no matches
        infos.append((int(r["df"]), t, r))
    infos.sort()
    df0, t0, r0 = infos[0]
    cand, tf0 = decode_postings(r0["doc_bytes"], r0["tf_bytes"], df0, base)
    term_hits = {t0: (cand, tf0)}
    for dfi, ti, ri in infos[1:]:
        if cand.size == 0:
            return False
        last = np.asarray(ri["block_last"], dtype=np.int64)
        nb = len(last)
        first = np.empty(nb, dtype=np.int64)
        first[0] = base
        first[1:] = last[:-1] + 1  # block i starts after block i-1's last docid
        lo = np.searchsorted(cand, first, side="left")
        hi = np.searchsorted(cand, last, side="right")
        keep = hi > lo
        d, tf = decode_blocks(
            ri["doc_bytes"], ri["tf_bytes"],
            np.asarray(ri["block_offs_doc"], np.int64),
            np.asarray(ri["block_offs_tf"], np.int64),
            dfi, base, keep, last,
        )
        pos = np.searchsorted(d, cand)
        pos_ok = pos < d.size
        hit = np.zeros(cand.shape, dtype=bool)
        hit[pos_ok] = d[pos[pos_ok]] == cand[pos_ok]
        cand = cand[hit]
        # narrow all previous terms' hit arrays lazily at the end instead
        term_hits[ti] = (d, tf)
    if cand.size == 0:
        return False
    # alphabetical term order — identical fp accumulation order to the
    # unpruned path (exactness contract: prune on == prune off, bit-for-bit)
    for t in sorted(term_hits):
        d, tf = term_hits[t]
        pos = np.searchsorted(d, cand)
        sel_tf = tf[pos]
        loc = cand - base
        w = weights[t] * idfs[t]
        scores[loc] += w * tfnorm(sel_tf, dl[loc], avgdl)
        matched[loc] = True
        req_count[loc] += 1
    return True


class Searcher:
    """Warm query session over one index — holds the terms/postings/docs
    DataFrames (and optionally caches the small ones) so repeated queries
    skip plan re-creation and re-scans. The reference analog is
    SolrIndexSearcher with its filter/document caches
    (solr/core/src/java/org/apache/solr/search/SolrIndexSearcher.java:894-986):
    term stats ≈ the term dictionary in heap, docs ≈ docValues pages in OS
    cache. Postings stay uncached (pruned parquet scans per query)."""

    def __init__(self, spark: SparkSession, meta: IndexMeta, cache: bool = True):
        import os

        self.spark = spark
        self.meta = meta
        self.terms = spark.read.parquet(meta.terms_path)
        self.postings = spark.read.parquet(meta.postings_path)
        self.docs = spark.read.parquet(meta.docs_path)
        self.bucket_stats = (
            spark.read.parquet(meta.bucket_stats_path)
            if _done(meta.bucket_stats_path)
            else None
        )
        if cache:
            self.terms = self.terms.cache()
            self.docs = self.docs.cache()
            self.terms.count()  # materialize
            self.docs.count()
            if self.bucket_stats is not None:
                self.bucket_stats = self.bucket_stats.cache()
                self.bucket_stats.count()
        # driver-side df cache for QUERY terms only (bounded by the terms
        # actually queried, never the vocabulary) — the term-dictionary-
        # in-heap part of SolrIndexSearcher; absent terms cache df=0
        self._df_cache: dict[str, int] = {}
        self._hot_terms: frozenset[str] | None = None
        self._hot_postings: DataFrame | None = None
        self._local_norms: tuple | None = None
        self._local_postings: dict[str, tuple] = {}

    def warm_terms(self, terms: list[str]) -> int:
        """Pin the pruned postings for a HOT TERM SET in executor memory
        (the warm-searcher path: SolrIndexSearcher's filterCache analog
        for the query-term working set). Queries whose terms all fall in
        the set scan the persisted frame instead of parquet — removing
        file-scan latency from the per-query floor; everything else
        takes the normal pruned-scan path. Memory is bounded by the
        named terms' postings, never the corpus. Returns the number of
        postings rows pinned."""
        from pyspark import StorageLevel

        toks = frozenset(t.lower() for t in terms)
        hot = self.postings.filter(
            F.col("term").isin(sorted(toks))
        ).persist(StorageLevel.MEMORY_AND_DISK)
        n = hot.count()  # materialize the pin
        if self._hot_postings is not None:
            self._hot_postings.unpersist()
        self._hot_terms, self._hot_postings = toks, hot
        return n

    def warm_local(self, terms: list[str]) -> dict:
        """Load a hot-term working set INTO THE DRIVER PROCESS for
        millisecond-latency serving (`local_topk`) — the reference's own
        architecture for interactive queries: Lucene keeps norms and the
        hot postings resident in the searcher process. Memory bound:
        one (doclen, live) pair per doc (9 bytes × n_docs — the norms
        file analog; 10.8 MB at 1.2M docs) plus the decoded postings of
        exactly the named terms. The distributed path remains the
        source of truth; local answers are bit-identical to it for the
        supported query classes (pinned by test — same numpy formula,
        same per-term accumulation order, same tie-break)."""
        toks = sorted({t.lower() for t in terms})
        if self._local_norms is None:
            pdf = self.docs.select("docid", "doclen").toPandas()
            dl = np.zeros(self.meta.n_docs, np.float64)
            live = np.zeros(self.meta.n_docs, bool)
            ids = pdf["docid"].to_numpy(np.int64)
            dl[ids] = pdf["doclen"].to_numpy(np.float64)
            live[ids] = True
            self._local_norms = (dl, live)
        rows = (
            self.postings.filter(F.col("term").isin(toks))
            .select("term", "bucket", "df", "doc_bytes", "tf_bytes")
            .toPandas()
        )
        for t in toks:
            grp = rows[rows["term"] == t].sort_values("bucket")
            ds, tfs = [], []
            for _, r in grp.iterrows():
                d, f = decode_postings(
                    r["doc_bytes"], r["tf_bytes"], int(r["df"]),
                    int(r["bucket"]) * self.meta.bucket_docs,
                )
                ds.append(d)
                tfs.append(f)
            self._local_postings[t] = (
                np.concatenate(ds) if ds else np.empty(0, np.int64),
                np.concatenate(tfs) if tfs else np.empty(0, np.int64),
            )
        missing = [t for t in toks if t not in self._df_cache]
        if missing:
            stats = self.terms.where(F.col("term").isin(missing)).collect()
            fetched = {r["term"]: int(r["df"]) for r in stats}
            for t in missing:
                self._df_cache[t] = fetched.get(t, 0)
        return {
            "terms": len(toks),
            "postings": int(sum(len(v[0]) for v in self._local_postings.values())),
        }

    def local_topk(self, q: "str | Query", k: int = 10) -> list[tuple[int, float]]:
        """Answer a top-k query from the driver-resident working set
        (millisecond path). Supported locally: plain term queries
        (optional / required / prohibited / boosts) whose every term is
        in the warm_local set; anything else (phrases, multiterm,
        filters, MUST groups, cold terms) transparently falls back to
        the distributed `search`. Returns [(docid, score)], score desc,
        docid asc — identical values and order to the distributed
        kernel (same formula, same sorted-term accumulation, same
        lexsort tie-break)."""
        query = parse(q) if isinstance(q, str) else q
        qterms = set(query.scoring) | query.prohibited
        eligible = (
            not query.phrases and not query.multiterm and not query.filters
            and not query.required_groups and qterms
            and qterms <= set(self._local_postings)
            and self._local_norms is not None
        )
        if not eligible:
            return [
                (int(r["docid"]), float(r["score"]))
                for r in self.search(q, k).collect()
            ]
        dfm = {t: self._df_cache.get(t, 0) for t in qterms}
        for t in query.required:
            if dfm.get(t, 0) == 0:
                return []
        weights0 = dict(query.scoring)
        present = [t for t in weights0 if dfm.get(t, 0) > 0]
        if not present:
            return []
        dl, live = self._local_norms
        n = self.meta.n_docs
        scores = np.zeros(n, np.float64)
        matched = np.zeros(n, bool)
        reqc = np.zeros(n, np.int16)
        req = set(query.required)
        for t in sorted(present):  # kernel's fixed-order fp accumulation
            d, tf = self._local_postings[t]
            w = weights0[t] * query.boosts.get(t, 1.0) * float(idf_fn(dfm[t], n))
            scores[d] += w * tfnorm(tf, dl[d], self.meta.avgdl)
            matched[d] = True
            if t in req:
                reqc[d] += 1
        alive = live.copy()
        for t in query.prohibited:
            d, _ = self._local_postings[t]
            alive[d] = False
        mask = alive & (reqc == len(req)) if req else alive & matched
        cand = np.flatnonzero(mask)
        if cand.size == 0:
            return []
        sc = scores[cand]
        if cand.size > max(k, 1) * 4:
            # exact top-k preselection: keep everything >= the k-th
            # largest score (ties included), then lexsort the remnant —
            # O(n) partition instead of an O(n log n) full sort over a
            # hot term's candidate set
            kth = np.partition(sc, cand.size - k)[cand.size - k] \
                if cand.size > k else sc.min()
            keep = sc >= kth
            cand, sc = cand[keep], sc[keep]
        sel = np.lexsort((cand, -sc))[:k]
        return [(int(cand[i]), float(sc[i])) for i in sel]

    def _frames_for(self, q) -> tuple:
        if self._hot_terms is not None:
            query = parse(q) if isinstance(q, str) else q
            qterms = (set(query.optional) | set(query.required)
                      | set(query.prohibited))
            if (qterms and qterms <= self._hot_terms
                    and not query.phrases and not query.multiterm):
                return (self.terms, self._hot_postings, self.docs,
                        self.bucket_stats)
        return (self.terms, self.postings, self.docs, self.bucket_stats)

    def search(self, q: str | Query, k: int = 10, prune: bool = True,
               with_fields: bool = False) -> DataFrame:
        return search(self.spark, self.meta, q, k, prune, with_fields,
                      _frames=self._frames_for(q),
                      _df_cache=self._df_cache)


def search(
    spark: SparkSession,
    meta: IndexMeta,
    q: str | Query,
    k: int = 10,
    prune: bool = True,
    with_fields: bool = False,
    _frames: tuple | None = None,
    _count_only: bool = False,
    _df_cache: dict | None = None,
    unsorted: bool = False,
) -> DataFrame:
    """Top-k BM25 search. Returns DataFrame(docid, score) ordered by
    (score desc, docid asc), limited to k; with_fields joins doc columns.
    ``unsorted=True`` (and the internal ``_count_only``, hit_count's
    path) returns ALL scored matches UNSORTED and UNLIMITED — the
    component mode for candidate generation and score folds, where the
    downstream join/union discards order anyway. A sorted k=n_docs call
    would compile to orderBy().limit(n_docs) — a corpus-sized
    TakeOrderedAndProject funneling every match through ONE task at
    scale; unsorted mode keeps the result distributed."""
    query = parse(q) if isinstance(q, str) else q
    if unsorted or _count_only:
        # no global sort → pruning must keep every match; k only feeds
        # the block-max WAND heap, so pin it corpus-sized (no-op prune)
        k = meta.n_docs
    if query.multiterm:
        raise ValueError(
            "kernel.search does not expand multi-term clauses "
            "(prefix/wildcard/fuzzy); use engine.gate_search"
        )
    if query.phrases:
        # Positionless postings cannot verify adjacency; the engine layer
        # (engine.gate_search / engine.gate_phrase) combines this kernel
        # with the two-phase content verify. Failing loudly beats silently
        # scoring a phrase query as a bag of nothing.
        raise ValueError(
            "kernel.search does not execute phrase clauses; use "
            "engine.gate_search (mixed) or engine.gate_phrase (pure phrase)"
        )
    weights = dict(query.scoring)

    def _empty():
        e = spark.createDataFrame([], RESULT_SCHEMA)
        if with_fields:
            docs_full = docs_df.drop("bucket", "doclen")
            e = e.join(docs_full, "docid", "left")
        return e
    if _frames:
        terms_df, postings_df, docs_df = _frames[0], _frames[1], _frames[2]
        bstats_df = _frames[3] if len(_frames) > 3 else None
    else:
        import os

        terms_df = spark.read.parquet(meta.terms_path)
        postings_df = spark.read.parquet(meta.postings_path)
        docs_df = spark.read.parquet(meta.docs_path)
        bstats_df = (
            spark.read.parquet(meta.bucket_stats_path)
            if _done(meta.bucket_stats_path)
            else None
        )

    all_terms = sorted(set(weights) | query.prohibited)
    if not weights:
        return _empty()
    if _df_cache is not None:
        missing = [t for t in all_terms if t not in _df_cache]
        if missing:
            stats = terms_df.where(F.col("term").isin(missing)).collect()
            fetched = {r["term"]: int(r["df"]) for r in stats}
            for t in missing:
                _df_cache[t] = fetched.get(t, 0)  # absent term: df=0
        df_map = {t: _df_cache[t] for t in all_terms}
    else:
        stats = terms_df.where(F.col("term").isin(all_terms)).collect()
        df_map = {r["term"]: int(r["df"]) for r in stats}
    groups = [list(g) for g in (query.required_groups or [])]
    if groups:
        # a MUST group dies only if EVERY alternative is absent
        for g in groups:
            if all(df_map.get(t, 0) == 0 for t in g):
                return _empty()
    else:
        for t in query.required:
            if df_map.get(t, 0) == 0:
                return _empty()
    present = [t for t in weights if df_map.get(t, 0) > 0]
    if not present:
        return _empty()
    # clause weight = multiplicity x boost (SolrQueryParser term^boost)
    weights = {t: weights[t] * query.boosts.get(t, 1.0) for t in present}
    idfs = {t: float(idf_fn(df_map[t], meta.n_docs)) for t in present}
    needed = sorted(set(present) | {t for t in query.prohibited if df_map.get(t, 0) > 0})

    postings = postings_df.where(F.col("term").isin(needed))
    # prune the docs scan to buckets that contain at least one query term
    buckets = postings.select("bucket").distinct()
    use_packed = bstats_df is not None and all(
        f in _PACKED_FILTER_COLS for f in query.filters
    )
    if use_packed:
        # packed per-bucket arrays: the cogroup's docs side is one row
        # per touched bucket, not one row per doc (indexer stage 2b)
        doc_stats = bstats_df.join(F.broadcast(buckets), "bucket", "left_semi")
    else:
        available = set(docs_df.columns)
        unknown = sorted(set(query.filters) - available)
        if unknown:
            # e.g. 'source': a gate-table alias the engine layer remaps
            # onto 'repo' — fail with the valid field list instead of an
            # opaque AnalysisException from the select below
            raise ValueError(
                f"unknown filter field(s) {unknown}; docs table columns: "
                f"{sorted(available)}"
            )
        doc_cols = ["docid", "bucket", "doclen"] + sorted(query.filters)
        doc_stats = docs_df.select(*doc_cols).join(
            F.broadcast(buckets), "bucket", "left_semi"
        )

    kern = _bucket_kernel(
        idfs, weights, sorted(query.required), sorted(query.prohibited),
        {f: list(v) for f, v in query.filters.items()},
        meta.avgdl, meta.bucket_docs, k,
        # the conjunction-prune path assumes plain AND over required
        # terms; MUST groups need the general matching mask
        prune and not groups,
        packed=use_packed,
        required_groups=groups or None,
    )
    scored = (
        postings.groupby("bucket")
        .cogroup(doc_stats.groupby("bucket"))
        .applyInPandas(kern, RESULT_SCHEMA)
    )
    if _count_only or unsorted:
        if with_fields and not _count_only:
            # loud guard: the unsorted component frame deliberately skips
            # the stored-fields join (it feeds other components, not a
            # result page) — silently returning (docid, score) would break
            # callers expecting doc columns
            raise ValueError("with_fields is not supported with unsorted=True")
        return scored
    out = scored.orderBy(F.desc("score"), F.asc("docid")).limit(k)
    if with_fields:
        docs_full = docs_df.drop("bucket", "doclen")
        out = (
            out.join(docs_full, "docid", "left")
            .orderBy(F.desc("score"), F.asc("docid"))
        )
    return out


def hit_count(
    spark: SparkSession,
    meta: IndexMeta,
    q: str | Query,
    min_exact_count: int | None = None,
) -> tuple[int, str]:
    """Hit-count contract of the reference's QueryCommand
    (core/.../search/QueryCommand.java:40,164-168 — minExactCount) and
    Lucene's TotalHits relation: returns (count, relation) with relation
    'EQ' (exact) or 'GTE' (lower bound after early termination).

    - single optional term, no filters/prohibited: answered from the term
      dictionary alone (df is exact; zero postings scanned);
    - min_exact_count set: matches are scored only up to that many; if the
      budget fills, the count is reported as a 'GTE' lower bound —
      the caller opted out of an exact count, exactly the reference's
      approximate-hits semantics;
    - otherwise: exact aggregation over all matches ('EQ')."""
    query = parse(q) if isinstance(q, str) else q
    terms = list(query.scoring)
    if (
        len(terms) == 1
        and not query.filters
        and not query.prohibited
        and not query.phrases
        and not query.multiterm
    ):
        stats = (
            spark.read.parquet(meta.terms_path)
            .where(F.col("term") == terms[0])
            .collect()
        )
        return (int(stats[0]["df"]) if stats else 0, "EQ")
    if min_exact_count is not None:
        n = len(search(spark, meta, query, k=min_exact_count).collect())
        return (n, "EQ" if n < min_exact_count else "GTE")
    # exact count: aggregate the scored matches, no global sort/limit
    n = search(spark, meta, query, k=meta.n_docs, _count_only=True).count()
    return (n, "EQ")


POSTING_ROWS_SCHEMA = "term string, docid bigint, tf bigint"


def decode_posting_frame(postings_df: DataFrame, bucket_docs: int) -> DataFrame:
    """Decode an arbitrary postings DataFrame back into (term, docid, tf)
    rows — the shared numpy varint explode used by the function-query
    surface AND the segment merge (one decode loop, never copies)."""

    def explode(batches):
        for pdf in batches:
            for _, r in pdf.iterrows():
                base = int(r["bucket"]) * bucket_docs
                d, tf = decode_postings(r["doc_bytes"], r["tf_bytes"], int(r["df"]), base)
                yield pd.DataFrame({"term": r["term"], "docid": d, "tf": tf})

    return postings_df.mapInPandas(explode, POSTING_ROWS_SCHEMA)


def postings_rows(
    spark: SparkSession, meta: IndexMeta, terms: list[str] | DataFrame
) -> DataFrame:
    """Explode the encoded postings of ``terms`` back into
    (term, docid, tf) rows — the DataFrame face of the index used by the
    function-query surface (termfreq/tf/docfreq/idf columns,
    SURVEY.md §2.7: 'index-statistic functions are columns of our
    postings/stats tables'; reference registry
    solr/core/src/java/org/apache/solr/search/ValueSourceParser.java:163-1397).
    Decoding is the same numpy varint kernel the scorer uses.

    ``terms`` may be a literal list (pruned isin scan) or a single-column
    DataFrame of terms (broadcast semi-join) — the DataFrame form keeps
    dictionary-driven expansions (prefix/wildcard/fuzzy) fully
    distributed, no term list ever reaching the driver."""
    postings = spark.read.parquet(meta.postings_path)
    if isinstance(terms, DataFrame):
        postings = postings.join(F.broadcast(terms.select("term")), "term", "left_semi")
    else:
        postings = postings.where(F.col("term").isin(terms))
    return decode_posting_frame(postings, meta.bucket_docs)


def term_contributions(spark: SparkSession, meta: IndexMeta, terms: list[str]) -> DataFrame:
    """Per-(docid, term) BM25 contribution as a DataFrame column —
    idf precomputed driver-side (same np.log as the scoring kernel), the
    tf-normalization evaluated as a Catalyst expression with the exact
    literal shape of scoring.tfnorm, so values are bit-identical to the
    fused kernel's contributions."""
    from .scoring import idf as idf_fn

    stats = (
        spark.read.parquet(meta.terms_path).where(F.col("term").isin(terms)).collect()
    )
    df_map = {r["term"]: int(r["df"]) for r in stats}
    present = [t for t in terms if df_map.get(t, 0) > 0]
    if not present:
        return spark.createDataFrame([], "docid bigint, term string, contrib double")
    idf_rows = [(t, float(idf_fn(df_map[t], meta.n_docs))) for t in present]
    idf_df = spark.createDataFrame(idf_rows, "term string, idf double")
    rows = postings_rows(spark, meta, present)
    doclens = spark.read.parquet(meta.docs_path).select("docid", "doclen")
    avgdl = meta.avgdl
    return (
        rows.join(F.broadcast(idf_df), "term")
        .join(doclens, "docid")
        .withColumn(
            "contrib",
            F.col("idf")
            * (
                F.col("tf").cast("double") * (F.lit(1.2) + F.lit(1.0))
                / (
                    F.col("tf").cast("double")
                    + F.lit(1.2)
                    * (
                        F.lit(1.0)
                        - F.lit(0.75)
                        + F.lit(0.75) * F.col("doclen").cast("double") / F.lit(avgdl)
                    )
                )
            ),
        )
        .select("docid", "term", "contrib")
    )


def dismax_search(
    spark: SparkSession,
    meta: IndexMeta,
    terms: list[str],
    tie: float = 0.0,
    k: int = 10,
    unsorted: bool = False,
) -> DataFrame:
    """DisMax scoring across query clauses: score = max(contribs) +
    tie * (sum(contribs) - max(contribs))
    (reference: solr/core/src/java/org/apache/solr/search/DisMaxQParser.java:1 —
    per-clause max plus tie-weighted remainder; tie at
    ExtendedDismaxQParser.java:1747).

    Implemented by pivoting per-term contributions wide and combining with
    greatest() — deterministic float evaluation order (sorted terms left
    to right), mirrored exactly by the DuckDB oracle."""
    terms = sorted(set(terms))
    contribs = term_contributions(spark, meta, terms)
    # pivot emits one column PER TERM VALUE — group under an alias the
    # tokenizer can never produce, or a query term spelled "docid" would
    # collide with the group key (AMBIGUOUS_REFERENCE)
    wide = (
        contribs.select(F.col("docid").alias("__docid"), "term", "contrib")
        .groupBy("__docid")
        .pivot("term", terms)
        .agg(F.first("contrib"))
    )
    cols = [F.coalesce(F.col(f"`{t}`"), F.lit(0.0)) for t in terms]
    total = cols[0]
    for c in cols[1:]:
        total = total + c
    mx = F.greatest(*cols) if len(cols) > 1 else cols[0]
    score = mx + F.lit(tie) * (total - mx)
    scored = wide.withColumn("score", score).select(
        F.col("__docid").alias("docid"), "score"
    )
    if unsorted:
        # component mode: the caller re-ranks on the ROUNDED score, so
        # this global TakeOrdered would be a corpus-sized funnel whose
        # ordering is discarded anyway
        return scored
    return scored.orderBy(F.desc("score"), F.asc("docid")).limit(k)


def total_term_freq(
    spark: SparkSession, meta: IndexMeta, terms: list[str]
) -> DataFrame:
    """totaltermfreq/ttf (ValueSourceParser 'totaltermfreq' →
    TotalTermFreqValueSource): corpus-wide occurrence count per term.
    One pruned postings scan (PushedFilters: In(term, ...)) feeding the
    same varint decode kernel the scorer uses; the per-term sum is a
    partial-aggregated groupBy — no doc rows reach the driver."""
    rows = postings_rows(spark, meta, sorted(set(terms)))
    return rows.groupBy("term").agg(F.sum("tf").alias("ttf"))


def explain_hits(
    spark: SparkSession, meta: IndexMeta, q: str | Query, k: int = 10
) -> DataFrame:
    """``[explain]`` doc transformer (CORE/response/transform/
    ExplainAugmenterFactory.java:1 — per-hit Lucene score breakdown):
    the top-k hits augmented with an ``explain`` array of
    (term, weight, contrib) structs whose weighted contribs sum to the
    hit's BM25 score. Contribs come from kernel.term_contributions (the
    exact literal shape of the scoring kernel), weights are the query's
    per-term clause multiplicities; the join is broadcast on the k-row
    hit set, so explain touches only the hits' postings."""
    query = parse(q) if isinstance(q, str) else q
    res = search(spark, meta, query, k=k)
    # materialize the k hits once: res is the whole scoring pipeline and is
    # referenced twice below (semi-join probe + final join), so without
    # this Spark would re-execute the top-k search per reference
    hit_rows = res.collect()
    res = (
        spark.createDataFrame(hit_rows, res.schema) if hit_rows else res
    )
    weights = sorted(query.scoring.items())
    if not weights or not hit_rows:
        return res.withColumn(
            "explain",
            F.lit(None).cast(
                "array<struct<term:string,weight:int,contrib:double>>"
            ),
        )
    # clause weight = multiplicity; the score path also folds term^boost
    # (search() line above: weights[t] * query.boosts.get(t, 1.0)) — the
    # explain contribs must fold the SAME boost or they stop summing to
    # the hit's score for boosted queries
    wdf = spark.createDataFrame(
        [(t, m, float(query.boosts.get(t, 1.0))) for t, m in weights],
        "term string, weight int, boost double",
    )
    contribs = term_contributions(spark, meta, [t for t, _ in weights])
    det = (
        contribs.join(F.broadcast(res.select("docid")), "docid", "left_semi")
        .join(F.broadcast(wdf), "term")
        .groupBy("docid")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "term",
                        "weight",
                        (
                            F.col("contrib")
                            * F.col("weight")
                            * F.col("boost")
                        ).alias("contrib"),
                    )
                )
            ).alias("explain")
        )
    )
    # the join discards search()'s ordering — restore rank order so pagers
    # that take row order as-is (write_response) render by score
    return res.join(det, "docid", "left").orderBy(
        F.desc("score"), F.asc("docid")
    )


def sum_total_term_freq(spark: SparkSession, meta: IndexMeta) -> DataFrame:
    """sumtotaltermfreq/sttf (SumTotalTermFreqValueSource): Σ ttf over
    every term of the field = Σ doclen over the docs table — computed
    from the 1-column doc-stats scan, NOT by decoding all postings (at
    100 TB the docs table is ~1e9 rows of one long vs postings in the
    trillions)."""
    docs = spark.read.parquet(meta.docs_path)
    return docs.agg(F.sum("doclen").cast("long").alias("sttf"))
