"""Query-parser unit tests (reference analog: QueryParsingTest /
QueryEqualityTest, /root/reference/solr/core/src/test/org/apache/solr/search/)."""

from solr_spark.qparser import parse


def test_basic_clauses():
    q = parse("spark +merge -dup lang:en")
    assert q.optional == {"spark": 1}
    assert q.required == {"merge": 1}
    assert q.prohibited == {"dup"}
    assert q.filters == {"lang": ["en"]}


def test_boost_and_phrase():
    q = parse('spark^2.5 "table value" +big^3')
    assert q.boosts == {"spark": 2.5, "big": 3.0}
    assert q.phrases == [["table", "value"]]
    assert q.required == {"big": 1}


def test_caret_not_a_boost():
    q = parse("weird^name")
    assert q.boosts == {}
    assert set(q.optional) == {"weird", "name"}  # ^ splits as punctuation


def test_analyzer_applied_to_clauses():
    q = parse("SPARK The-Window")
    assert set(q.optional) == {"spark", "window"}  # lowercased, stopword dropped


def test_duplicate_multiplicity():
    q = parse("spark spark merge")
    assert q.scoring["spark"] == 2 and q.scoring["merge"] == 1


def test_stopword_only_phrase_dropped():
    q = parse('"the and" spark')
    assert q.phrases == [] and set(q.optional) == {"spark"}


def test_filter_multi_value_or():
    q = parse("lang:en lang:zh spark")
    assert q.filters == {"lang": ["en", "zh"]}
