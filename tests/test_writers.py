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
