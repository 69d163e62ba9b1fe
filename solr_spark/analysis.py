"""Text analysis: code-aware tokenization + stop filtering, fully vectorized.

Re-implements the semantics of the reference's default ``text_general``
analyzer chain (StandardTokenizer -> StopFilter -> LowerCaseFilter;
solr/server/solr/configsets/_default/conf/managed-schema.xml:297-313),
simplified to a code-friendly contract that is expressible BOTH as pandas
vector ops (the engine's ingest kernel) and as ANSI SQL (the DuckDB
correctness oracle):

  ANALYSIS CONTRACT (pinned; tests + oracle depend on it)
  1. lowercase the whole string
  2. tokens = maximal runs of [a-z0-9_]  (identifiers stay whole —
     camelCase is lowercased, snake_case survives; punctuation splits)
  3. drop the 33 classic English stopwords (Lucene
     EnglishAnalyzer.ENGLISH_STOP_WORDS_SET)
  4. doclen = number of surviving tokens (exact, NOT Lucene's 1-byte
     quantized norm — documented deviation, see SURVEY.md §4)

SQL-equivalent form (DuckDB/Spark SQL):
  unnest(string_split_regex(lower(text), '[^a-z0-9_]+')) ... WHERE tok <> ''
    AND tok NOT IN (<STOPWORDS>)
"""

from __future__ import annotations

import re
from itertools import chain

import numpy as np
import pandas as pd

TOKEN_RE = re.compile(r"[a-z0-9_]+")

# Lucene's classic 33-word English stop set (EnglishAnalyzer): public
# knowledge; mirrored in the reference's default schema stopwords config.
STOPWORDS: frozenset[str] = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)

# Stable, SQL-quotable rendering for oracle generation.
STOPWORDS_SQL = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))

SPLIT_REGEX_SQL = "[^a-z0-9_]+"  # for string_split_regex / split()


def tokenize_lists(texts: pd.Series) -> pd.Series:
    """Series[str] -> Series[list[str]] of post-stop-filter tokens."""
    toks = texts.fillna("").str.lower().str.findall(TOKEN_RE)
    # Vectorized stop filtering: flatten -> mask -> regroup is slower for
    # short docs; a per-list comprehension over interned strings is the
    # pragmatic fast path here (set lookup is C-level).
    sw = STOPWORDS
    return toks.map(lambda ts: [t for t in ts if t not in sw])


def term_frequencies(doc_ids: np.ndarray, texts: pd.Series) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Analyze a batch of documents — the ingest hot path, fully
    vectorized (no per-row Python beyond the C-level regex scan):

      1. tokenize: pandas .str.findall (C regex loop)
      2. factorize the flat token stream to int32 codes (one hash pass)
      3. stop-filter on the (tiny) unique-term table, mask by code
      4. tf counts via a single int64 sort+run-length (np.unique) over
         the combined (docid, code) key — no object-dtype groupby

    Returns ``(triples, doc_lens)``:
      triples  — DataFrame(docid int64, term str, tf int64),
                 sorted by (docid, first-occurrence code order)
      doc_lens — DataFrame(docid int64, doclen int64)  (0 for empty docs)
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n_docs = doc_ids.size
    tok_lists = texts.fillna("").str.lower().str.findall(TOKEN_RE)
    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n_docs)
    flat = list(chain.from_iterable(tok_lists))
    if not flat:
        return (
            pd.DataFrame({"docid": np.array([], np.int64), "term": pd.Series([], dtype=object), "tf": np.array([], np.int64), "doclen": np.array([], np.int64)}),
            pd.DataFrame({"docid": doc_ids, "doclen": np.zeros(n_docs, np.int64)}),
        )
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object), sort=False)
    keep_uniq = ~pd.Index(uniques).isin(STOPWORDS)
    keep = keep_uniq[codes]
    # docid positions (0..n_docs-1) repeated per token, stop-filtered
    pos = np.repeat(np.arange(n_docs, dtype=np.int64), counts)[keep]
    codes = codes[keep]
    doclens = np.bincount(pos, minlength=n_docs).astype(np.int64)
    # combined key: doc position * n_uniques + code → one sort + run-length
    # (manual RLE beats np.unique's extra flatten/mask passes)
    k = np.int64(len(uniques))
    key = pos * k + codes
    key.sort()
    change = np.empty(key.size, dtype=bool)
    change[0] = True
    np.not_equal(key[1:], key[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    tf = np.diff(np.append(starts, key.size))
    ukey = key[starts]
    upos = ukey // k
    triples = pd.DataFrame(
        {
            "docid": doc_ids[upos],
            "term": uniques[(ukey % k)],
            "tf": tf.astype(np.int64),
            "doclen": doclens[upos],
        }
    )
    doc_lens = pd.DataFrame({"docid": doc_ids, "doclen": doclens})
    return triples, doc_lens


def analyze_query(q: str) -> list[str]:
    """Apply the same analysis chain to a query string (bag of terms,
    duplicates preserved — duplicate query terms score with multiplicity,
    matching Lucene's boolean-query clause semantics)."""
    return [t for t in TOKEN_RE.findall(q.lower()) if t not in STOPWORDS]
