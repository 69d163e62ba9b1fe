"""BM25 scoring — the correctness contract of the whole engine.

Formula (reference defaults: k1=1.2, b=0.75, discountOverlaps=true —
solr/core/src/java/org/apache/solr/search/similarities/
BM25SimilarityFactory.java:47-50; default similarity per
SchemaSimilarityFactory.java:34-38):

    idf(t)     = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    tfnorm(t,d)= tf * (k1+1) / (tf + k1 * (1 - b + b * dl_d / avgdl))
    score(q,d) = sum over matching clauses of idf(t) * tfnorm(t,d)

Pinned deviations from Lucene internals (documented per SURVEY.md §4):
  - dl_d is the EXACT post-stopword token count (Lucene quantizes the
    norm to 1 byte via SmallFloat; our pytest oracle uses exact doclen).
  - avgdl = sum(doclen) / N over ALL docs in the corpus (N = row count).
Ties broken by ascending docid (mergeIds queue semantics,
solr/core/src/java/org/apache/solr/handler/component/
ShardFieldSortedHitQueue.java).
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def tfnorm(tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float = K1, b: float = B) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def bm25_sql_expr(term_col: str = "tf", dl_col: str = "doclen", df_col: str = "df",
                  n: str = "n_docs", avgdl: str = "avgdl") -> str:
    """The identical formula as an ANSI SQL expression fragment (works in
    both Spark SQL and DuckDB — used to generate oracle queries)."""
    return (
        f"ln(1 + ({n} - {df_col} + 0.5) / ({df_col} + 0.5)) * "
        f"({term_col} * (1.2 + 1) / ({term_col} + 1.2 * (1 - 0.75 + 0.75 * {dl_col} / {avgdl})))"
    )


def bm25_pandas_oracle(
    docs: "list[list[str]]", query_terms: list[str], k: int
) -> list[tuple[int, float]]:
    """Independent brute-force oracle (pure python/numpy, no Spark):
    docs[i] = token list of docid i. Returns [(docid, score)] top-k,
    score desc, docid asc. Used only by tests."""
    n = len(docs)
    if n == 0:
        return []
    dls = np.array([len(d) for d in docs], dtype=np.float64)
    avgdl = dls.sum() / n
    scores = np.zeros(n, dtype=np.float64)
    matched = np.zeros(n, dtype=bool)
    for t in query_terms:
        tf = np.array([d.count(t) for d in docs], dtype=np.float64)
        has = tf > 0
        df_t = int(has.sum())
        if df_t == 0:
            continue
        w = idf(df_t, n)
        scores[has] += w * tfnorm(tf[has], dls[has], avgdl)
        matched |= has
    cand = np.flatnonzero(matched)
    order = sorted(cand, key=lambda i: (-scores[i], i))[:k]
    return [(int(i), float(scores[i])) for i in order]
