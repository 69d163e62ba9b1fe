"""text_ru / text_el chains: native-script light stemming + deterministic
transliteration fold expressed as ingest pre-transforms into the pinned
[a-z0-9_]+ term space (the non-Latin-script slots of the reference's
language fieldType registry — text_ru / text_el in managed-schema;
capability anchor CORE/schema/TextField.java:1), with query/index
symmetry and sha256 on the original bytes, exactly like the CJK chain."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_spark.analysis import (
    ANALYZERS,
    PRE_TRANSFORMS,
    greek_fold,
    russian_fold,
)
from solr_spark.stem import greek_light_stem, russian_light_stem


# ---------------------------------------------------------------------------
# stemmer rule tables (native script)


def test_russian_light_vectors():
    vec = {
        # number/case endings conflate to one stem
        "книга": "книг", "книги": "книг", "книгами": "книг",
        "дома": "дом", "домой": "дом",
        "красивый": "красив", "красивая": "красив", "красивые": "красив",
        # strip must leave >= 3 letters
        "стол": "стол", "он": "он", "и": "и",
    }
    bad = {w: (russian_light_stem(w), want)
           for w, want in vec.items() if russian_light_stem(w) != want}
    assert bad == {}


def test_greek_light_vectors():
    vec = {
        "βιβλια": "βιβλι", "βιβλιο": "βιβλι",
        "ανθρωπος": "ανθρωπ", "ανθρωπων": "ανθρωπ",
        "θαλασσα": "θαλασσ",
        # strip must leave >= 3 letters
        "και": "και", "το": "το",
    }
    bad = {w: (greek_light_stem(w), want)
           for w, want in vec.items() if greek_light_stem(w) != want}
    assert bad == {}


def test_stem_applied_at_most_once():
    # 'книгами' strips 'ами' (longest suffix), NOT iteratively down to
    # nothing — one pass, longest match wins
    assert russian_light_stem("книгами") == "книг"
    # longest suffix ('ματα', 4 letters) wins over the 1-letter 'α'
    assert greek_light_stem("ματαματα") == "ματα"


# ---------------------------------------------------------------------------
# fold transforms


def test_russian_fold_vectors():
    # stemmed then transliterated, injected with spaces
    assert russian_fold("книга").strip() == "knig"
    assert russian_fold("книги").strip() == "knig"  # conflates with книга
    assert russian_fold("Жизнь хороша").split() == ["zhizn", "khorosh"]
    # mixed Latin/Cyrillic: Latin text untouched
    out = russian_fold("читает parquet файлы")
    assert "parquet" in out and "chita" in out and "fajl" in out
    # identity fast path
    s = "pure ascii text"
    assert russian_fold(s) is s
    assert russian_fold(None) is None


def test_greek_fold_vectors():
    assert greek_fold("βιβλια").strip() == "vivli"
    assert greek_fold("βιβλιο").strip() == "vivli"  # conflates
    # diacritics + final sigma normalize before stemming
    assert greek_fold("άνθρωπος").strip() == greek_fold("ανθρωπος").strip()
    s = "no greek here"
    assert greek_fold(s) is s


def test_fold_output_in_token_space():
    import re

    tok = re.compile(r"^[a-z0-9_]+$")
    for fold, text in ((russian_fold, "съешь ещё этих мягких булок"),
                       (greek_fold, "ψυχή και σῶμα")):
        for t in fold(text).split():
            assert tok.match(t), (fold, t)


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="абвгдежзийклмнопрстуфхцчшщъыьэюяё ", max_size=30))
def test_russian_fold_tokens_always_legal(text):
    import re

    tok = re.compile(r"^[a-z0-9_]+$")
    for t in russian_fold(text).split():
        assert tok.match(t)


def test_registry_wiring():
    assert PRE_TRANSFORMS["text_ru"] is russian_fold
    assert PRE_TRANSFORMS["text_el"] is greek_fold
    assert ANALYZERS["text_ru"] is None
    assert ANALYZERS["text_el"] is None


# ---------------------------------------------------------------------------
# end-to-end index/search round trip


def test_russian_index_search_roundtrip(spark, tmp_path):
    """Documents with Cyrillic content indexed under text_ru are matched
    by INFLECTED Russian query forms through the same fold (stemming
    conflates книга/книги/книгами), Latin terms in mixed docs still
    work, and sha256 stays on the original bytes."""
    from pyspark.sql import functions as F

    from solr_spark import kernel
    from solr_spark.indexer import build_index
    from solr_spark.qparser import parse

    rows = [
        ("r", "a", "0", "ru", "книга про spark и данные"),
        ("r", "b", "0", "ru", "другие книги здесь"),
        ("r", "c", "0", "en", "no cyrillic at all"),
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    meta = build_index(
        spark, docs, str(tmp_path / "ru_idx"), bucket_docs=256,
        num_partitions=2, analyzer="text_ru",
    )

    def search(q, k=10):
        folded = PRE_TRANSFORMS["text_ru"](q)
        res = kernel.search(spark, meta, parse(folded), k=k)
        dm = spark.read.parquet(meta.docs_path).select("docid", "path")
        return {r["path"] for r in res.join(dm, "docid").collect()}

    # all three inflected forms hit both docs (stem conflation)
    for q in ("книга", "книги", "книгами"):
        assert search(q) == {"a", "b"}, q
    # Latin term inside a mixed doc
    assert search("spark") == {"a"}
    # sha256 over ORIGINAL content
    docs_tbl = spark.read.parquet(meta.docs_path)
    sha_a = docs_tbl.where(F.col("path") == "a").select("sha256").head()[0]
    assert sha_a == hashlib.sha256(rows[0][4].encode()).hexdigest()
