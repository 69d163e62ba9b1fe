"""Round-4 batch 3 chains: Bulgarian/Armenian/Hindi native-script folds,
the Thai bigram fallback, the tight WordDelimiter variant, and the
FULL analyzer-registry parity freeze against the reference's
managed-schema text_* fieldType list."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_spark.analysis import (
    ANALYZER_EXCLUSIONS,
    ANALYZERS,
    PRE_TRANSFORMS,
    armenian_fold,
    bulgarian_fold,
    hindi_fold,
    thai_bigram_fold,
    thai_dict_fold,
    word_delimiter_fold_tight,
)

_TOK = re.compile(r"^[a-z0-9_]+$")


def test_bulgarian_stem_vectors():
    from solr_spark.stem import bulgarian_light_stem

    vec = {
        "книгите": "книг", "градът": "град", "жената": "жена",
        "момчето": "момче", "градове": "град", "книга": "книг",
        "град": "град",
    }
    bad = {w: (bulgarian_light_stem(w), want)
           for w, want in vec.items() if bulgarian_light_stem(w) != want}
    assert bad == {}


def test_armenian_stem_vectors():
    from solr_spark.stem import armenian_light_stem

    vec = {
        "գրքերի": "գրք", "տներում": "տներ",
        "քաղաքներին": "քաղաք", "գիրք": "գիրք",
    }
    bad = {w: (armenian_light_stem(w), want)
           for w, want in vec.items() if armenian_light_stem(w) != want}
    assert bad == {}


def test_hindi_stem_vectors():
    from solr_spark.stem import hindi_light_stem, hindi_normalize

    vec = {
        "किताबों": "किताब", "लड़कियों": "लडक",
        "कमरे": "कमर", "किताब": "किताब",  # consonant-final: unchanged
    }
    bad = {}
    for w, want in vec.items():
        got = hindi_light_stem(hindi_normalize(w))
        if got != want:
            bad[w] = (got, want)
    assert bad == {}


def test_fold_vectors():
    # Bulgarian: ъ is a vowel ('a'), щ is 'sht' — NOT the Russian map
    assert bulgarian_fold("българия").strip() == "balgar"  # -ия stripped
    assert bulgarian_fold("борщ").strip() == "borsht"
    # Armenian
    assert armenian_fold("գիրք").strip() == "girk"
    # Hindi (normalized + stemmed + romanized)
    assert hindi_fold("किताबों").strip() == "kitaab"
    # identity fast paths
    s = "plain text"
    for fold in (bulgarian_fold, armenian_fold, hindi_fold,
                 thai_bigram_fold):
        assert fold(s) is s


def test_thai_bigram_fold():
    out = thai_bigram_fold("ภาษาไทย")
    toks = out.split()
    # n-1 overlapping bigrams for an n-char run
    assert len(toks) == 6
    assert all(t.startswith("th_") and _TOK.match(t) for t in toks)
    # single Thai char -> unigram token
    assert thai_bigram_fold("ก").strip() == f"th_{ord('ก'):04x}"
    # query/index symmetry is the same function; mixed text keeps ASCII
    assert thai_bigram_fold("abc ไทย x").split()[0] == "abc"


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_folds_emit_legal_tokens(data):
    # each fold handles ITS OWN script (one chain per field) — draw text
    # from the matching alphabet per fold
    cases = [
        (bulgarian_fold, "бгджзъщьяюавеиклмнопрст "),
        (armenian_fold, "գիրքերնմուհայտղծ "),
        (hindi_fold, "किताबेंोीुमरल "),
        (thai_bigram_fold, "ไทยภาษากขคงจ "),
        (thai_dict_fold, "ไทยภาษากขคงจ "),
    ]
    for fold, alphabet in cases:
        text = data.draw(st.text(alphabet=alphabet, max_size=24))
        for t in fold(text).split():
            assert _TOK.match(t), (fold, text, t)


def test_tight_wdg_vectors():
    vec = {
        "wi-fi": " wifi ",
        "getFooBar": " getFooBar ",       # one letter group -> catenation
        "A380-800": " A 380800 ",          # letter group single, digits join
        "foo123bar": " foo 123 bar ",      # all groups single: parts kept
        "hello": "hello",
        "snake_case": " snakecase ",
    }
    bad = {w: (word_delimiter_fold_tight(w), want)
           for w, want in vec.items()
           if word_delimiter_fold_tight(w) != want}
    assert bad == {}


def test_registry_wiring():
    from solr_spark.analysis import s_stem

    for name, fold in (
        ("text_bg", bulgarian_fold), ("text_hy", armenian_fold),
        ("text_hi", hindi_fold), ("text_th", thai_dict_fold),
        ("text_en_splitting_tight", word_delimiter_fold_tight),
    ):
        assert PRE_TRANSFORMS[name] is fold, name
        # tight WDG carries the EnglishMinimalStem (s_stem) tail;
        # the other four are pre-transform-only
        want = s_stem if name == "text_en_splitting_tight" else None
        assert ANALYZERS[name] is want, name
    from solr_spark.analysis import cjk_bigram_fold

    assert PRE_TRANSFORMS["text_ja"] is cjk_bigram_fold
    assert PRE_TRANSFORMS["text_ko"] is cjk_bigram_fold
    assert ANALYZERS["text_general"] is None
    assert ANALYZERS["text_greek"] is None


# The reference's complete text_* fieldType inventory
# (solr/server/solr/configsets/_default/conf/managed-schema.xml) —
# FROZEN: every name must be an implemented chain or a documented
# exclusion, so a reference fieldType can never silently fall through.
REFERENCE_TEXT_FIELDTYPES = [
    "text_ar", "text_bg", "text_ca", "text_cjk", "text_cz", "text_da",
    "text_de", "text_el", "text_en", "text_en_splitting",
    "text_en_splitting_tight", "text_es", "text_et", "text_eu",
    "text_fa", "text_fi", "text_fr", "text_ga", "text_gen_sort",
    "text_general", "text_general_rev", "text_gl", "text_greek",
    "text_hi", "text_hu", "text_hy", "text_id", "text_it", "text_ja",
    "text_ko", "text_lv", "text_nl", "text_no", "text_pt", "text_ro",
    "text_ru", "text_sv", "text_th", "text_tr", "text_ws",
]


def test_reference_fieldtype_parity():
    assert len(REFERENCE_TEXT_FIELDTYPES) == 40
    unknown = [
        n for n in REFERENCE_TEXT_FIELDTYPES
        if n not in ANALYZERS and n not in ANALYZER_EXCLUSIONS
    ]
    assert unknown == [], f"reference fieldTypes not covered: {unknown}"
    # exclusions carry reasons and never shadow an implementation
    for n, reason in ANALYZER_EXCLUSIONS.items():
        assert n not in ANALYZERS, n
        assert len(reason) > 10, n
    # count the implemented surface: 37 of 40 names resolve to chains
    impl = [n for n in REFERENCE_TEXT_FIELDTYPES if n in ANALYZERS]
    assert len(impl) == 37, sorted(set(REFERENCE_TEXT_FIELDTYPES) - set(impl))


def test_thai_dict_fold_segmentation():
    from solr_spark.analysis import THAI_WORDS, _th_word_token

    # dictionary phrase -> one token per word, longest match wins
    assert thai_dict_fold("สวัสดีครับ").split() == [
        _th_word_token("สวัสดี"), _th_word_token("ครับ")]
    assert thai_dict_fold("โรงเรียน").split() == [_th_word_token("โรงเรียน")]
    # OOV stretch between dictionary words falls back to bigrams
    toks = thai_dict_fold("ไทยฃฅไทย").split()
    assert toks[0] == _th_word_token("ไทย") and toks[-1] == _th_word_token("ไทย")
    assert all(t.startswith("th_") for t in toks)
    # no-Thai passthrough and mixed text
    s = "plain"
    assert thai_dict_fold(s) is s
    assert thai_dict_fold("abc ไทย x").split() == ["abc", _th_word_token("ไทย"), "x"]
    # the dictionary is sorted longest-first deterministically
    assert len(set(THAI_WORDS)) == len(THAI_WORDS)


def test_thai_dict_search_end_to_end(spark, tmp_path):
    # index/query symmetry through the REAL build+search path
    import solr_spark.kernel as kernel
    from solr_spark.indexer import build_index
    from solr_spark.qparser import parse

    rows = [
        ("r", f"p{i}", f"c{i}", "md", txt)
        for i, txt in enumerate([
            "ผมรักประเทศไทย",       # รัก + ประเทศ + ไทย
            "โรงเรียนของเรา",        # โรงเรียน ...
            "plain english text",
            "ภาษาไทย ดี",
        ])
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")
    meta = build_index(spark, df, str(tmp_path / "th_idx"), analyzer="text_th")
    # query/index symmetry: the query folds through the SAME pre-transform
    q = parse(thai_dict_fold("ประเทศไทย"))
    got = kernel.search(spark, meta, q, k=4).collect()
    assert len(got) >= 1  # the ประเทศ+ไทย doc matches via word tokens
