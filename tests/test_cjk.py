"""text_cjk chain: CJK bigram fold (CJKBigramFilter semantics —
lucene/analysis/common/.../cjk/CJKBigramFilter.java — expressed as an
ingest pre-transform into the pinned [a-z0-9_]+ term space), checked
against an independent loop-based reference implementation, plus the
end-to-end index/search round trip with query/index symmetry."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_spark.analysis import (
    ANALYZERS,
    PRE_TRANSFORMS,
    _CJK_RUN_RE,
    cjk_bigram_fold,
)


def _ref_fold(text: str) -> str:
    """Independent reference: explicit char loop (no regex, no shared
    code with cjk_bigram_fold's run/replacement machinery)."""

    def is_cjk(ch: str) -> bool:
        cp = ord(ch)
        return (
            0x3040 <= cp <= 0x30FF   # hiragana + katakana
            or 0x3400 <= cp <= 0x4DBF  # ext A
            or 0x4E00 <= cp <= 0x9FFF  # unified ideographs
            or 0xAC00 <= cp <= 0xD7AF  # hangul
        )

    out: list[str] = []
    run: list[str] = []

    def flush():
        if not run:
            return
        if len(run) == 1:
            out.append(f" cjk_{ord(run[0]):05x} ")
        else:
            grams = [
                f"cjk_{ord(a):05x}_{ord(b):05x}"
                for a, b in zip(run, run[1:])
            ]
            out.append(" " + " ".join(grams) + " ")
        run.clear()

    for ch in text:
        if is_cjk(ch):
            run.append(ch)
        else:
            flush()
            out.append(ch)
    flush()
    return "".join(out)


def test_fold_vectors():
    # 中=U+4E2D 文=U+6587 测=U+6D4B 试=U+8BD5
    assert cjk_bigram_fold("中文") == " cjk_04e2d_06587 "
    assert cjk_bigram_fold("中") == " cjk_04e2d "
    assert (
        cjk_bigram_fold("中文测试")
        == " cjk_04e2d_06587 cjk_06587_06d4b cjk_06d4b_08bd5 "
    )
    # mixed ASCII + CJK: ASCII untouched, runs broken by non-CJK
    assert (
        cjk_bigram_fold("spark中文engine")
        == "spark cjk_04e2d_06587 engine"
    )
    # punctuation splits runs (two singleton runs, not one bigram)
    assert cjk_bigram_fold("中,文") == " cjk_04e2d , cjk_06587 "
    # identity fast path
    s = "pure ascii stays identical"
    assert cjk_bigram_fold(s) is s
    assert cjk_bigram_fold(None) is None


def test_fold_hiragana_katakana_hangul():
    # か=U+304B な=U+306A (hiragana); カ=U+30AB (katakana); 한=U+D55C 글=U+AE00
    assert cjk_bigram_fold("かな") == " cjk_0304b_0306a "
    assert cjk_bigram_fold("カ") == " cjk_030ab "
    assert cjk_bigram_fold("한글") == " cjk_0d55c_0ae00 "


def test_fold_tokens_are_engine_tokens():
    from solr_spark.analysis import TOKEN_RE

    folded = cjk_bigram_fold("x 中文测试 y かカ한")
    for tok in folded.split():
        assert TOKEN_RE.fullmatch(tok) or tok in ("x", "y"), tok


@settings(max_examples=60, deadline=None)
@given(st.text(
    alphabet=st.sampled_from(
        list("abc 09_.,!") + list("中文测试数据引擎かなカナ한글값")
    ),
    max_size=40,
))
def test_fold_matches_reference(text):
    assert cjk_bigram_fold(text) == _ref_fold(text)


def test_fold_is_injective_on_cjk_bigrams():
    """Distinct bigrams map to distinct tokens (5-hex-digit codepoints
    with a '_' separator cannot collide across pairs)."""
    chars = "中文测试数据かカ한"
    seen = {}
    for a in chars:
        for b in chars:
            tok = cjk_bigram_fold(a + b).strip()
            assert seen.setdefault(tok, (a, b)) == (a, b)


def test_registry_wiring():
    assert ANALYZERS["text_cjk"] is None
    assert PRE_TRANSFORMS["text_cjk"] is cjk_bigram_fold


def test_cjk_index_search_roundtrip(spark, tmp_path):
    """End-to-end: documents with CJK content indexed under text_cjk are
    matched by CJK query strings through the SAME fold (query/index
    symmetry), bigram tf is counted per overlapping occurrence, and the
    stored content sha stays that of the ORIGINAL bytes."""
    import hashlib

    from pyspark.sql import functions as F

    from solr_spark import kernel
    from solr_spark.analysis import PRE_TRANSFORMS
    from solr_spark.indexer import build_index
    from solr_spark.qparser import parse

    rows = [
        ("r", "a", "0", "zh", "数据引擎 handles 数据 fast"),
        ("r", "b", "0", "zh", "引擎 only here"),
        ("r", "c", "0", "en", "no cjk content at all"),
        ("r", "d", "0", "ja", "かなカナ text"),
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    meta = build_index(
        spark, docs, str(tmp_path / "cjk_idx"), bucket_docs=256,
        num_partitions=2, analyzer="text_cjk",
    )

    def search(q, k=10):
        folded = PRE_TRANSFORMS["text_cjk"](q)
        res = kernel.search(spark, meta, parse(folded), k=k)
        dm = spark.read.parquet(meta.docs_path).select("docid", "path")
        return {r["path"]: r["score"] for r in res.join(dm, "docid").collect()}

    # 数据 = one bigram term; docs a (tf 2) — doc b has 引擎 only
    got = search("数据")
    assert set(got) == {"a"}
    # 引擎 appears in a and b
    got = search("引擎")
    assert set(got) == {"a", "b"}
    # katakana/hiragana doc
    got = search("かなカナ")
    assert set(got) == {"d"}
    # ASCII terms still work through the same index
    got = search("fast")
    assert set(got) == {"a"}
    # content sha256 is over ORIGINAL content (fold feeds tokenizer only)
    docs_tbl = spark.read.parquet(meta.docs_path)
    sha_a = docs_tbl.where(F.col("path") == "a").select("sha256").head()[0]
    assert sha_a == hashlib.sha256(rows[0][4].encode()).hexdigest()


# ---------------------------------------------------------------------------
# text_folded (ASCIIFoldingFilter slot)


def test_ascii_fold_vectors():
    from solr_spark.analysis import ascii_fold

    assert ascii_fold("café") == "cafe"
    # ß does not NFKD-decompose to ss — passes through (documented:
    # Latin accent plane only, not the full Lucene foldToASCII table)
    assert ascii_fold("naïve Müller straße") == "naive Muller straße"
    assert ascii_fold("Müller") == "Muller"
    assert ascii_fold("ÀÉÎÕÜ çñ") == "AEIOU cn"
    # identity fast path for pure ASCII
    s = "plain ascii"
    assert ascii_fold(s) is s
    assert ascii_fold(None) is None
    # NFKD compatibility forms: ligatures + full-width
    assert ascii_fold("ﬁle") == "file"
    assert ascii_fold("ａｂｃ") == "abc"


def test_ascii_fold_registry():
    from solr_spark.analysis import ANALYZERS, PRE_TRANSFORMS, ascii_fold

    assert ANALYZERS["text_folded"] is None
    assert PRE_TRANSFORMS["text_folded"] is ascii_fold


def test_ascii_fold_query_index_symmetry():
    """Folded query and folded content tokenize identically."""
    from solr_spark.analysis import ascii_fold, analyze_query

    doc = "Café RÉSUMÉ naïve"
    q = "café résumé naïve"
    assert analyze_query(ascii_fold(doc)) == ["cafe", "resume", "naive"]
    assert analyze_query(ascii_fold(q)) == ["cafe", "resume", "naive"]
