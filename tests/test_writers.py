"""Response writers: XML / CBOR / javabin / GeoJSON / GraphML round-trips."""

import json
import xml.etree.ElementTree as ET

from solr_spark.sources import cbor, javabin, writers


def _docs(spark):
    return spark.createDataFrame(
        [(1, "alpha", 1.5, True), (2, "be<ta>&", 2.0, False), (3, "gamma", 0.25, True)],
        "id bigint, name string, score double, flag boolean",
    )


def test_xml_response(spark):
    out = writers.write_xml_response(_docs(spark), rows=2)
    root = ET.fromstring(out)
    result = root.find("result")
    assert result.attrib["numFound"] == "3" and result.attrib["start"] == "0"
    docs = result.findall("doc")
    assert len(docs) == 2
    first = {e.attrib["name"]: (e.tag, e.text) for e in docs[0]}
    assert first["id"] == ("int", "1")
    assert first["score"] == ("double", "1.5")
    assert first["flag"] == ("bool", "true")
    # escaping survives the parse: the raw value comes back intact
    second = {e.attrib["name"]: e.text for e in docs[1]}
    assert second["name"] == "be<ta>&"


def test_cbor_response_round_trip(spark):
    blob = writers.write_cbor_response(_docs(spark), rows=None)
    back = cbor.loads(blob)
    assert back["response"]["numFound"] == 3
    assert back["response"]["docs"][0]["name"] == "alpha"
    assert back["response"]["docs"][2]["score"] == 0.25


def test_javabin_response_round_trip(spark):
    blob = writers.write_javabin_response(_docs(spark), rows=2, start=1)
    back = javabin.loads(blob)
    assert back["responseHeader"]["status"] == 0
    assert back["response"]["numFound"] == 3 and back["response"]["start"] == 1
    assert [d["id"] for d in back["response"]["docs"]] == [2, 3]


def test_wt_dispatch(spark):
    from solr_spark.sources import write_response

    assert json.loads(write_response(_docs(spark)))["response"]["numFound"] == 3
    assert write_response(_docs(spark), wt="xml").startswith("<?xml")
    assert isinstance(write_response(_docs(spark), wt="cbor"), bytes)
    assert isinstance(write_response(_docs(spark), wt="javabin"), bytes)


def test_geojson(spark):
    df = spark.createDataFrame(
        [(1, 57.6, 10.4, "port"), (2, -25.4, -49.3, "city")],
        "id bigint, lat double, lon double, kind string",
    )
    out = json.loads(writers.write_geojson(df, "lat", "lon", rows=None))
    assert out["type"] == "FeatureCollection" and out["numFound"] == 2
    f0 = out["features"][0]
    assert f0["geometry"]["coordinates"] == [10.4, 57.6]  # [lon, lat]
    assert f0["properties"] == {"id": 1, "kind": "port"}


def test_graphml(spark):
    df = spark.createDataFrame(
        [("b", ["a"], 1), ("c", ["a", "b"], 2), ("a", None, 0)],
        "node string, ancestors array<string>, depth int",
    )
    out = writers.write_graphml(df, "node", "ancestors", field_cols=("depth",))
    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    root = ET.fromstring(out)
    graph = root.find("g:graph", ns)
    nodes = {n.attrib["id"] for n in graph.findall("g:node", ns)}
    edges = {
        (e.attrib["source"], e.attrib["target"])
        for e in graph.findall("g:edge", ns)
    }
    assert nodes == {"a", "b", "c"}
    assert edges == {("a", "b"), ("a", "c"), ("b", "c")}


def test_smile_roundtrip_values():
    from solr_spark.sources import smile

    cases = [
        None, True, False, 0, 7, -16, 15, 16, -17, 1000, -100000,
        2**40, -(2**40), 3.14159, -2.5e-300, 0.0,
        "", "a", "x" * 32, "y" * 33, "z" * 64, "w" * 65, "long" * 100,
        "café", "ünïcode" * 3, "é" * 40,
        {"k": 1, "nested": {"a": [1, 2.5, "s", None, True]}},
        [[], {}, [{"x": "y"}]],
        {"ключ": "значение", "k" * 70: "v"},  # unicode + long key forms
    ]
    for c in cases:
        assert smile.loads(smile.dumps(c)) == c
    assert smile.dumps(1)[:4] == smile.HEADER


def test_smile_response_envelope(spark):
    from solr_spark.sources import smile
    from solr_spark.sources.writers import write_smile_response

    df = spark.createDataFrame(
        [(1, "hello", 1.5), (2, "wörld", -2.0)], "id long, s string, v double"
    )
    blob = write_smile_response(df, rows=10)
    env = smile.loads(blob)
    assert env["responseHeader"]["status"] == 0
    assert env["response"]["numFound"] == 2
    assert env["response"]["docs"][1]["s"] == "wörld"


def test_xml_int_long_boundary(spark):
    """int32 boundary: 2**31-1 is the largest <int>; 2**31 and -2**31-1
    must be <long> (XMLWriter's primitive mapping)."""
    df = spark.createDataFrame(
        [(2**31 - 1, 2**31, -(2**31), -(2**31) - 1)],
        "a bigint, b bigint, c bigint, d bigint",
    )
    out = writers.write_xml_response(df, rows=1)
    root = ET.fromstring(out)
    tags = {e.attrib["name"]: e.tag for e in root.find("result").find("doc")}
    assert tags == {"a": "int", "b": "long", "c": "int", "d": "long"}
