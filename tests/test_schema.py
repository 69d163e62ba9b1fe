"""dynamicField / copyField / schemaless ingest shim (solr_spark.schema)."""

import pytest

from solr_spark.schema import (
    SchemaSpec,
    apply_schema,
    infer_schema,
    pattern_matches,
)


def test_pattern_matching_solr_glob():
    assert pattern_matches("title_txt", "*_txt")
    assert pattern_matches("attr_color", "attr_*")
    assert pattern_matches("anything", "*")
    assert not pattern_matches("txt_title", "*_txt")
    assert pattern_matches("exact", "exact")
    assert not pattern_matches("exact2", "exact")


def test_longest_dynamic_pattern_wins():
    spec = SchemaSpec(dynamic_fields={"*_txt": "text", "*_en_txt": "string",
                                      "*": "pdouble"})
    assert spec.type_of("body_en_txt") == "string"  # longest pattern
    assert spec.type_of("body_txt") == "text"
    assert spec.type_of("other") == "pdouble"
    spec2 = SchemaSpec(fields={"body_txt": "string"},
                       dynamic_fields={"*_txt": "text"})
    assert spec2.type_of("body_txt") == "string"  # exact beats pattern


def test_apply_schema_casts_and_copies(spark):
    df = spark.createDataFrame(
        [("d1", "hello world", "t one", "5"), ("d2", "bye", "t two", "7")],
        "id string, body_txt string, title_txt string, rank_i string",
    )
    spec = SchemaSpec(
        fields={"id": "string"},
        dynamic_fields={"*_txt": "text", "*_i": "pint"},
        copy_fields=[("*_txt", "content")],
    )
    out = apply_schema(df, spec, schemaless=False)
    assert dict((f.name, f.dataType.simpleString()) for f in out.schema.fields) == {
        "id": "string", "body_txt": "string", "title_txt": "string",
        "rank_i": "int", "content": "string",
    }
    rows = {r["id"]: r for r in out.collect()}
    # copyField accumulates sources in column order
    assert rows["d1"]["content"] == "hello world t one"
    assert rows["d1"]["rank_i"] == 5


def test_copyfield_appends_to_existing_dest(spark):
    df = spark.createDataFrame(
        [("seed", "extra_txt value")], "content string, note_txt string"
    )
    spec = SchemaSpec(fields={"content": "text"},
                      dynamic_fields={"*_txt": "text"},
                      copy_fields=[("*_txt", "content")])
    out = apply_schema(df, spec).collect()[0]
    assert out["content"] == "seed extra_txt value"


def test_schemaless_inference_and_strict_mode(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "x")], "a bigint, b double, c string"
    )
    spec = SchemaSpec(fields={"a": "plong"})
    assert infer_schema(df, spec) == {"b": "pdouble", "c": "text_general"}
    out = apply_schema(df, spec)  # schemaless: inferred types applied
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "double", "string",
    ]
    with pytest.raises(ValueError, match="undeclared"):
        apply_schema(df, spec, schemaless=False)


def test_unknown_type_raises(spark):
    df = spark.createDataFrame([(1,)], "a bigint")
    with pytest.raises(ValueError, match="unknown schema type"):
        apply_schema(df, SchemaSpec(fields={"a": "bogus"}))
