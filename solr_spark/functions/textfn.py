"""Text-analysis column functions — all JVM-side Spark expressions.

These are the per-document functions a 100 TB training-data pipeline
needs (token counting, language ID, quality scoring, fingerprinting).
Everything here compiles to Catalyst expressions inside whole-stage
codegen — zero Python in the hot path. The tokenization contract matches
solr_spark.analysis (lowercase → [a-z0-9_]+ runs → stop filter), which is
the engine-wide ANALYSIS CONTRACT pinned in analysis.py and mirrors the
reference's text_general chain
(/root/reference/solr/server/solr/configsets/_default/conf/managed-schema.xml:297-313).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..analysis import SPLIT_REGEX_SQL, STOPWORDS

def _stop_array() -> Column:
    # built lazily: F.lit requires an active SparkContext
    return F.array(*[F.lit(w) for w in sorted(STOPWORDS)])


def tokens(text: Column) -> Column:
    """Analyzed token array (order-preserving): lowercase → split on
    non-[a-z0-9_] → drop empties → drop stopwords. Pure Catalyst
    (split + filter + array_contains), no UDF."""
    raw = F.split(F.lower(text), SPLIT_REGEX_SQL)
    return F.filter(
        raw,
        lambda t: (t != F.lit("")) & ~F.array_contains(_stop_array(), t),
    )


def token_count(text: Column) -> Column:
    """Post-analysis token count (the doclen used by BM25)."""
    return F.size(tokens(text)).cast("bigint")


# BPE-style pretokenizer regex (the GPT-2 pattern's ASCII core —
# contraction suffixes, space-prefixed letter/digit runs, punctuation
# runs, whitespace runs). ASCII classes keep Java-regex (Spark) and RE2
# (DuckDB) tokenization identical; no lookahead so both engines accept it.
BPE_REGEX = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_pretokens(text: Column) -> Column:
    """BPE-ish pretokenization (the LLM-pipeline token-budget estimator):
    the GPT-2 pretokenizer split, minus actual merge ranks — counts of
    these pretokens upper-bound real BPE token counts within a small
    factor, which is what corpus token accounting needs."""
    return F.regexp_extract_all(text, F.lit(BPE_REGEX), 0)


def bpe_token_count(text: Column) -> Column:
    """Pretoken count excluding pure-whitespace matches."""
    return F.size(
        F.filter(bpe_pretokens(text), lambda t: ~t.rlike(r"^\s+$"))
    ).cast("bigint")


def whitespace_token_count(text: Column) -> Column:
    """Raw whitespace token count — the cheap pre-filter count pipelines
    use before full analysis."""
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))).cast("bigint")


def stopword_ratio(text: Column) -> Column:
    """Fraction of raw tokens that are stopwords — a classic quality
    signal (near-0 → code/gibberish, ~0.4 → natural English)."""
    raw = F.filter(F.split(F.lower(text), SPLIT_REGEX_SQL), lambda t: t != F.lit(""))
    stops = F.filter(raw, lambda t: F.array_contains(_stop_array(), t))
    return (F.size(stops).cast("double") / F.greatest(F.size(raw), F.lit(1)).cast("double"))


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters or space."""
    clean = F.regexp_replace(text, r"[^A-Za-z ]", "")
    return F.length(clean).cast("double") / F.greatest(F.length(text), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + alpha ratio +
    stopword presence. Deterministic, SQL-expressible (oracle-checked)."""
    n = F.length(text)
    len_ok = F.when((n >= 50) & (n <= 20000), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(
        F.lit(0.4) * len_ok + F.lit(0.4) * alpha_ratio(text) + F.lit(0.2) * stopword_ratio(text),
        6,
    )


# Language marker words — tiny deterministic n-gram-ish heuristic. Each
# language scored by count of its marker words among the doc's tokens;
# argmax wins, ties broken by language code ascending, zero matches → 'und'.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "por", "como", "para"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour", "qui", "sur"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich"),
}


def lang_id(text: Column) -> Column:
    """Marker-word language ID. Note markers are matched on RAW lowercase
    tokens (before stop filtering — English markers ARE stopwords)."""
    raw = F.filter(F.split(F.lower(text), SPLIT_REGEX_SQL), lambda t: t != F.lit(""))
    out = F.lit("und")
    best = F.lit(0)
    # iterate langs in sorted order so ties keep the earliest language
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        cnt = F.size(F.filter(raw, lambda t: F.array_contains(markers, t)))
        gt = cnt > best
        out = F.when(gt, F.lit(lang)).otherwise(out)
        best = F.when(gt, cnt).otherwise(best)
    return out


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the canonical analyzed token stream.
    Two docs with identical post-analysis content collide — the
    normalization-then-hash dedup signature (reference analog:
    update/processor/SignatureUpdateProcessorFactory.java +
    TextProfileSignature)."""
    return F.md5(F.concat_ws(" ", tokens(text)))


def sorted_fingerprint(text: Column) -> Column:
    """Order-insensitive fingerprint (bag-of-words): md5 of the sorted
    token array — catches shuffled near-duplicates."""
    return F.md5(F.concat_ws(" ", F.array_sort(tokens(text))))
