"""CBOR loader: RFC 8949 decoder unit tests (spec test vectors) + the
distributed read path."""

from __future__ import annotations

import math

import pytest

from solr_spark.sources import cbor


# RFC 8949 appendix A test vectors (hex → value)
VECTORS = [
    ("00", 0),
    ("01", 1),
    ("0a", 10),
    ("17", 23),
    ("1818", 24),
    ("18ff", 255),
    ("190100", 256),
    ("1a000f4240", 1000000),
    ("1b000000e8d4a51000", 1000000000000),
    ("20", -1),
    ("3863", -100),
    ("390388", -905),
    ("f4", False),
    ("f5", True),
    ("f6", None),
    ("f90000", 0.0),
    ("f93c00", 1.0),
    ("f9c400", -4.0),
    ("fa47c35000", 100000.0),
    ("fb3ff199999999999a", 1.1),
    ("40", b""),
    ("4401020304", b"\x01\x02\x03\x04"),
    ("60", ""),
    ("6161", "a"),
    ("6449455446", "IETF"),
    ("62c3bc", "ü"),
    ("80", []),
    ("83010203", [1, 2, 3]),
    ("8301820203820405", [1, [2, 3], [4, 5]]),
    ("a0", {}),
    ("a201020304", {1: 2, 3: 4}),
    ("a26161016162820203", {"a": 1, "b": [2, 3]}),
    ("826161a161626163", ["a", {"b": "c"}]),
    # indefinite-length forms
    ("5f42010243030405ff", b"\x01\x02\x03\x04\x05"),
    ("7f657374726561646d696e67ff", "streaming"),
    ("9f010203ff", [1, 2, 3]),
    ("bf61610161629f0203ffff", {"a": 1, "b": [2, 3]}),
    # tag unwrapping (epoch date tag 1)
    ("c11a514b67b0", 1363896240),
]


@pytest.mark.parametrize("hx,want", VECTORS)
def test_rfc8949_vectors(hx, want):
    assert cbor.loads(bytes.fromhex(hx)) == want


def test_half_float_specials():
    assert cbor.loads(bytes.fromhex("f97c00")) == math.inf
    assert cbor.loads(bytes.fromhex("f9fc00")) == -math.inf
    assert math.isnan(cbor.loads(bytes.fromhex("f97e00")))
    assert cbor.loads(bytes.fromhex("f90001")) == pytest.approx(5.960464477539063e-8)


def test_roundtrip():
    doc = {
        "id": 42,
        "title": "hello",
        "tags": ["a", "b"],
        "score": -1.5,
        "ok": True,
        "blob": b"\x00\xff",
        "missing": None,
        "neg": -1000,
    }
    assert cbor.loads(cbor.dumps(doc)) == doc


def test_cbor_sequence():
    data = cbor.dumps({"a": 1}) + cbor.dumps({"b": 2})
    assert list(cbor.iter_items(data)) == [{"a": 1}, {"b": 2}]


def test_read_cbor_updates(spark, tmp_path):
    payload = [
        {"id": 1, "title": "first", "tags": ["x", "y"]},
        {"id": 2, "title": "second"},
    ]
    f = tmp_path / "updates.cbor"
    f.write_bytes(cbor.dumps(payload))
    out = cbor.read_cbor_updates(spark, str(f)).collect()
    fields = sorted((r["fields"] for r in out), key=lambda m: m["id"][0])
    assert fields[0]["id"] == ["1"]
    assert fields[0]["tags"] == ["x", "y"]
    assert fields[1]["title"] == ["second"]
