"""text_en_splitting chain (WordDelimiterGraphFilter slot): fold
vectors, an independent char-scan reference for the hypothesis
differential, registry wiring, and an end-to-end index/search round
trip with query/index symmetry (camelCase conflation through Porter)."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_spark.analysis import (
    ANALYZERS,
    PRE_TRANSFORMS,
    word_delimiter_fold,
)


def _ref_tokens_for_run(run: str) -> list:
    """Independent reference: explicit per-char state machine (no
    regex, no code shared with word_delimiter_fold). Returns the token
    list a splittable run should expand to (parts then catenations)."""

    def kind(ch):
        if ch.isdigit():
            return "d"
        if ch.isupper():
            return "U"
        if ch.islower():
            return "l"
        return "-"  # delimiter (- or _)

    # pass 1: parts
    parts, cur = [], ""
    ks = [kind(c) for c in run]
    for i, ch in enumerate(run):
        k = ks[i]
        if k == "-":
            if cur:
                parts.append(cur)
            cur = ""
            continue
        if cur:
            pk = ks[i - 1]
            boundary = (
                (pk == "l" and k == "U")
                or (pk in "lU" and k == "d")
                or (pk == "d" and k in "lU")
            )
            if boundary:
                parts.append(cur)
                cur = ""
            elif pk == "U" and k == "l" and len(cur) >= 2 and cur.isupper():
                # acronym: last upper starts the new part
                parts.append(cur[:-1])
                cur = cur[-1:]
        cur += ch
    if cur:
        parts.append(cur)
    if len(parts) <= 1:
        return [run]
    # pass 2: catenations over maximal same-type groups of >= 2 parts
    cats, group = [], [parts[0]]
    for p in parts[1:]:
        if p.isdigit() == group[-1].isdigit():
            group.append(p)
        else:
            if len(group) >= 2:
                cats.append("".join(group))
            group = [p]
    if len(group) >= 2:
        cats.append("".join(group))
    return parts + cats


def _ref_fold(text: str) -> str:
    """Whole-string reference: split into alnum/-/_ runs by hand and
    expand each splittable run via _ref_tokens_for_run."""
    out, run = [], ""
    for ch in text:
        in_run = ch.isascii() and (ch.isalnum() or ch in "-_")
        if in_run:
            run += ch
            continue
        if run:
            out.append(_flush(run))
            run = ""
        out.append(ch)
    if run:
        out.append(_flush(run))
    return "".join(out)


def _flush(run: str) -> str:
    # strip leading/trailing delimiters the run regex would not include
    core = run.strip("-_")
    if not core:
        return run
    head, tail = run[: len(run) - len(run.lstrip("-_"))], run[
        len(run.rstrip("-_")) :
    ]
    # the engine's run regex disallows doubled internal delimiters:
    # split on those and process each piece independently
    pieces, piece = [], ""
    prev_delim = False
    for ch in core:
        if ch in "-_":
            if prev_delim:
                pieces.append(piece)
                pieces.append(ch)
                piece = ""
                continue
            prev_delim = True
        else:
            prev_delim = False
        piece += ch
    pieces.append(piece)
    done = []
    for p in pieces:
        if not p or p in "-_" or p.strip("-_") != p:
            # pieces that start/end with a delimiter: recurse on the core
            done.append(p if p in "-_" or not p else _flush(p))
            continue
        toks = _ref_tokens_for_run(p)
        done.append(p if len(toks) == 1 else " " + " ".join(toks) + " ")
    return head + "".join(done) + tail


VECTORS = {
    # case transitions + catenateWords
    "getFooBar": " get Foo Bar getFooBar ",
    "XMLParser": " XML Parser XMLParser ",
    "PowerShot": " Power Shot PowerShot ",
    # delimiters
    "wi-fi": " wi fi wifi ",
    "snake_case_id": " snake case id snakecaseid ",
    # splitOnNumerics + catenateNumbers
    "foo123bar": " foo 123 bar ",
    "A380-800": " A 380 800 380800 ",
    "SD500": " SD 500 ",
    # no boundary: unchanged
    "hello": "hello",
    "Hello": "Hello",
    "HELLO": "HELLO",
    "hello world": "hello world",
    "a": "a",
    "42": "42",
}


def test_fold_vectors():
    bad = {
        w: (word_delimiter_fold(w), want)
        for w, want in VECTORS.items()
        if word_delimiter_fold(w) != want
    }
    assert bad == {}


def test_fold_identity_fast_path():
    s = "plain ascii lowercase text with spaces"
    assert word_delimiter_fold(s) is s
    assert word_delimiter_fold(None) is None


def test_fold_end_to_end_tokens():
    """Through the full pipeline contract: fold -> lowercase -> token
    split -> stop filter (what the indexer's stage 1 computes)."""
    from solr_spark.analysis import STOPWORDS, TOKEN_RE

    def toks(text):
        folded = word_delimiter_fold(text)
        return [
            t
            for t in TOKEN_RE.findall(folded.lower())
            if t not in STOPWORDS
        ]

    assert toks("getFooBar(x)") == ["get", "foo", "bar", "getfoobar", "x"]
    assert toks("parse inBox items") == [
        "parse", "box", "inbox", "items"  # 'in' is a stopword part
    ]
    # catenateAll=0: '11ax' has one digit part + one letter part, so no
    # catenation is emitted for it
    assert toks("802.11ax Wi-Fi") == [
        "802", "11", "ax", "wi", "fi", "wifi"
    ]


@settings(max_examples=120, deadline=None)
@given(
    st.text(
        alphabet="abcDEFgHiJ019-_ .(,/汉",
        min_size=0,
        max_size=24,
    )
)
def test_fold_matches_reference(text):
    assert word_delimiter_fold(text) == _ref_fold(text)


def test_registry_wiring():
    from solr_spark.stem import porter_stem

    assert PRE_TRANSFORMS["text_en_splitting"] is word_delimiter_fold
    assert ANALYZERS["text_en_splitting"] is porter_stem


def test_wdg_index_search_roundtrip(spark, tmp_path):
    """End-to-end under analyzer='text_en_splitting': camelCase docs
    match plain-word queries and vice versa (query/index symmetry
    through the same fold), Porter conflates inflected parts, and
    content sha256 stays on the ORIGINAL bytes."""
    from pyspark.sql import functions as F

    from solr_spark import kernel
    from solr_spark.analysis import PRE_TRANSFORMS
    from solr_spark.indexer import build_index
    from solr_spark.qparser import parse

    rows = [
        ("r", "a", "0", "java", "class QueryParser extends BaseParser"),
        ("r", "b", "0", "py", "def parse_query(raw): return tokens"),
        ("r", "c", "0", "txt", "nothing relevant here"),
        ("r", "d", "0", "go", "func getFooBar() int"),
    ]
    docs = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string",
    )
    meta = build_index(
        spark, docs, str(tmp_path / "wdg_idx"), bucket_docs=256,
        num_partitions=2, analyzer="text_en_splitting",
    )

    def search(q, k=10):
        from collections import Counter

        from solr_spark.analysis import ANALYZERS

        folded = PRE_TRANSFORMS["text_en_splitting"](q)
        query = parse(folded)
        # query/index symmetry: the same dictionary transform (Porter)
        # the index build applied — mirrors engine.gate_search
        transform = ANALYZERS["text_en_splitting"]
        for attr in ("optional", "required"):
            stemmed = Counter()
            for t, c in getattr(query, attr).items():
                stemmed[transform(t)] += c
            setattr(query, attr, stemmed)
        res = kernel.search(spark, meta, query, k=k)
        dm = spark.read.parquet(meta.docs_path).select("docid", "path")
        return {r["path"] for r in res.join(dm, "docid").collect()}

    # 'query' matches the camelCase doc (QueryParser -> query parser)
    # and the snake_case doc (parse_query -> parse query); Porter also
    # conflates 'queries'
    assert search("queries") == {"a", "b"}
    # a camelCase QUERY splits the same way, so plain-word docs match
    assert search("parseQuery") == {"a", "b"}
    # catenated form indexed: exact camelCase identifier still findable
    assert search("getFooBar") == {"d"}
    # sha256 over ORIGINAL content
    docs_tbl = spark.read.parquet(meta.docs_path)
    sha_a = docs_tbl.where(F.col("path") == "a").select("sha256").head()[0]
    assert sha_a == hashlib.sha256(rows[0][4].encode()).hexdigest()
