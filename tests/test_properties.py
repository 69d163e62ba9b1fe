"""Property-based tests (hypothesis): codec round-trips, analyzer
contract invariants, query-parser totality, mm arithmetic bounds, CBOR
round-trip — the randomized-corpus style of the reference's test
framework (solr/test-framework RandomizedTesting usage) applied to the
engine's pure kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from solr_spark.analysis import STOPWORDS, analyze_query, s_stem
from solr_spark.codec import (
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)
from solr_spark.qparser import calculate_mm, parse
from solr_spark.sources import cbor

MAX_EXAMPLES = 60


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=400)
)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**9),  # base
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4095),  # local docid
            st.integers(min_value=1, max_value=1000),  # tf
            st.integers(min_value=1, max_value=5000),  # doclen
        ),
        min_size=1,
        max_size=300,
        unique_by=lambda t: t[0],
    ),
)
def test_postings_roundtrip(base, rows):
    rows.sort()
    docids = np.array([base + r[0] for r in rows], dtype=np.int64)
    tfs = np.array([r[1] for r in rows], dtype=np.int64)
    dls = np.array([r[2] for r in rows], dtype=np.int64)
    enc = encode_postings(docids, tfs, dls, base)
    d, tf = decode_postings(enc.doc_bytes, enc.tf_bytes, enc.df, base)
    assert np.array_equal(d, docids) and np.array_equal(tf, tfs)
    # block metadata invariants: per-block maxima/minima bound the data
    assert enc.df == len(rows)
    assert int(np.asarray(enc.block_max_tf).max()) == int(tfs.max())
    assert int(np.asarray(enc.block_last)[-1]) == int(docids[-1])


_word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=12)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(_word)
def test_s_stem_invariants(w):
    out = s_stem(w)
    # never grows by more than the ies->y rewrite, never empties
    assert out
    assert len(out) <= len(w)
    if len(w) <= 2 or not w.endswith("s"):
        assert out == w or w.endswith("ies")


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(st.text(max_size=80))
@example("-*")
@example("+a*")
@example("-spark~")
def test_parse_total(q):
    """The parser either parses arbitrary input or raises the ONE
    documented loud guard (required/prohibited multi-term clauses like
    '-*' / '+spar*' / '-spark~' are unsupported — qparser.py rejects
    them rather than silently matching the wrong docs). Parsed outputs
    honor the analysis contract (lowercase, no stopwords in scoring
    terms)."""
    try:
        query = parse(q)
    except ValueError as e:
        assert "unsupported" in str(e)
        return
    for t in list(query.scoring) + sorted(query.prohibited):
        assert t == t.lower()
        assert t not in STOPWORDS
    for ph in query.phrases:
        for t in ph:
            assert t not in STOPWORDS


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789 _", max_size=60))
def test_analyze_query_matches_contract(text):
    toks = analyze_query(text)
    for t in toks:
        assert t and t not in STOPWORDS


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(
    st.integers(min_value=1, max_value=20),
    st.one_of(
        st.integers(min_value=-10, max_value=10).map(str),
        st.integers(min_value=-100, max_value=100).map(lambda p: f"{p}%"),
    ),
)
def test_calculate_mm_bounds(n, spec):
    got = calculate_mm(n, spec)
    assert 1 <= got <= n


_cbor_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False),
    st.text(max_size=30),
    st.binary(max_size=30),
)
_cbor_values = st.recursive(
    _cbor_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=6),
        st.dictionaries(st.text(max_size=8), children, max_size=6),
    ),
    max_leaves=20,
)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(_cbor_values)
def test_cbor_roundtrip(v):
    assert cbor.loads(cbor.dumps(v)) == v
