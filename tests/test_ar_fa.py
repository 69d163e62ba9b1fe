"""Arabic (text_ar) / Persian (text_fa) chains: normalization vectors,
light10 stem vectors, fold token-space property, registry wiring, and an
end-to-end index/search round trip with inflected-form conflation."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_spark.analysis import (
    ANALYZERS,
    PRE_TRANSFORMS,
    arabic_fold,
    persian_fold,
)
from solr_spark.stem import (
    arabic_light_stem,
    arabic_normalize,
    persian_normalize,
)


def test_arabic_normalize_vectors():
    vec = {
        # alef variants -> bare alef
        "أحمد": "احمد",
        "إسلام": "اسلام",
        "آخر": "اخر",
        # teh marbuta -> heh; alef maqsura -> yeh
        "مكتبة": "مكتبه",
        "مستشفى": "مستشفي",
        # tatweel + tashkeel dropped
        "كتـــاب": "كتاب",
        "مُحَمَّد": "محمد",
    }
    bad = {w: (arabic_normalize(w), want)
           for w, want in vec.items() if arabic_normalize(w) != want}
    assert bad == {}


def test_arabic_light_stem_vectors():
    # applied to the NORMALIZED form, like the analyzer chain does
    vec = {
        "والكتاب": "كتاب",     # wal- prefix
        "الكتاب": "كتاب",      # al- prefix
        "بالقلم": "قلم",        # bal- prefix
        "للطلاب": "طلاب",      # lil- prefix
        "كتابها": "كتاب",      # -ha suffix
        "مسلمون": "مسلم",      # -un suffix
        "مدرسات": "مدرس",      # -at suffix
        "المكتبة": "مكتب",     # al- + (teh marbuta->heh) -h suffix
        "كتب": "كتب",           # too short to strip anything
    }
    bad = {}
    for w, want in vec.items():
        got = arabic_light_stem(arabic_normalize(w))
        if got != want:
            bad[w] = (got, want)
    assert bad == {}


def test_persian_normalize_vectors():
    vec = {
        "کتابی": "كتابي",      # keheh->kaf, farsi yeh->yeh
        "دانشگاه": "دانشگاه",  # gaf survives (translit handles it)
    }
    bad = {w: (persian_normalize(w), want)
           for w, want in vec.items() if persian_normalize(w) != want}
    assert bad == {}


def test_fold_vectors():
    # normalized + stemmed + romanized, space-isolated
    assert arabic_fold("الكتاب").strip() == "ktab"
    assert arabic_fold("x والكتاب y").split() == ["x", "ktab", "y"]
    # Persian: no stem; ZWNJ splits runs (half-space compounds)
    assert persian_fold("می‌روم").split() == ["my", "rwm"]
    s = "no arabic here"
    assert arabic_fold(s) is s
    assert persian_fold(s) is s


def test_fold_output_in_token_space():
    import re

    tok = re.compile(r"^[a-z0-9_]+$")
    for fold, text in (
        (arabic_fold, "العربية لغة جميلة مُحَمَّد"),
        (persian_fold, "زبان فارسی شیرین است"),
    ):
        for t in fold(text).split():
            assert tok.match(t), (text, t)


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="ابتثجحخدذرزسشصضطظعغفقكلمنهويءةىآأإپچژگکی ـًٌٍَُِّْ",
               max_size=30))
def test_arabic_fold_tokens_always_legal(text):
    import re

    tok = re.compile(r"^[a-z0-9_]+$")
    for fold in (arabic_fold, persian_fold):
        for t in fold(text).split():
            assert tok.match(t), (text, t)


def test_registry_wiring():
    assert PRE_TRANSFORMS["text_ar"] is arabic_fold
    assert PRE_TRANSFORMS["text_fa"] is persian_fold
    assert ANALYZERS["text_ar"] is None
    assert ANALYZERS["text_fa"] is None


def test_arabic_index_search_roundtrip(spark, tmp_path):
    """Documents with Arabic content indexed under text_ar are matched
    by INFLECTED query forms through the same fold (light10 conflates
    الكتاب/والكتاب/كتابها onto كتاب), Latin terms in mixed docs still
    work, and sha256 stays on the original bytes."""
    from pyspark.sql import functions as F

    from solr_spark import kernel
    from solr_spark.indexer import build_index
    from solr_spark.qparser import parse

    rows = [
        ("r", "a", "0", "ar", "الكتاب عن spark هنا"),
        ("r", "b", "0", "ar", "كتابها القديم"),
        ("r", "c", "0", "en", "no arabic at all"),
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    meta = build_index(
        spark, docs, str(tmp_path / "ar_idx"), bucket_docs=256,
        num_partitions=2, analyzer="text_ar",
    )

    def search(q, k=10):
        folded = PRE_TRANSFORMS["text_ar"](q)
        res = kernel.search(spark, meta, parse(folded), k=k)
        dm = spark.read.parquet(meta.docs_path).select("docid", "path")
        return {r["path"] for r in res.join(dm, "docid").collect()}

    # inflected forms conflate onto the كتاب stem -> both docs
    for q in ("الكتاب", "والكتاب", "كتابها"):
        assert search(q) == {"a", "b"}, q
    # Latin term inside a mixed doc
    assert search("spark") == {"a"}
    # sha256 over ORIGINAL content
    docs_tbl = spark.read.parquet(meta.docs_path)
    sha_a = docs_tbl.where(F.col("path") == "a").select("sha256").head()[0]
    assert sha_a == hashlib.sha256(rows[0][4].encode()).hexdigest()
