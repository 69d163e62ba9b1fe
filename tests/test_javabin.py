"""JavaBin codec: spec vectors (hand-assembled against the public
JavaBinCodec.java wire layout), encode/decode round-trips, and the Spark
update-request loader."""

import struct
from datetime import datetime, timezone

import pytest

from solr_spark.sources import javabin as jb


def test_spec_vectors_scalars():
    # stream version byte 2 leads every payload
    assert jb.dumps(None) == bytes([2, 0x00])
    assert jb.dumps(True) == bytes([2, 0x01])
    assert jb.dumps(False) == bytes([2, 0x02])
    # small int: SINT(0x40) | low nibble
    assert jb.dumps(5) == bytes([2, 0x45])
    # small int with continuation: 100000 = 0x186A0 → tag 0x50, vint(6250)
    assert jb.dumps(100000) == bytes([2, 0x50, 0xEA, 0x30])
    # double: plain tag 5 + big-endian ieee754
    assert jb.dumps(1.5) == bytes([2, 5]) + struct.pack(">d", 1.5)
    # string: STR(0x20) | byte length
    assert jb.dumps("ab") == bytes([2, 0x22]) + b"ab"
    for v in [None, True, False, 0, 5, 15, 16, 31, 100000, 2**40, -7, 1.5, "ab"]:
        assert jb.loads(jb.dumps(v)) == v


def test_spec_vector_named_list_extern_cache():
    # NAMED_LST(0xC0)|2 entries; first name is a fresh extern string
    # (0xE0 + STR "k"), the second a cache reference (0xE1)
    data = bytes([2, 0xC0 | 2, 0xE0, 0x21, ord("k"), 0x41, 0xE1, 0x42])
    assert jb.loads(data) == {"k": 2}  # duplicate names: last wins


def test_round_trip_compound():
    doc = {
        "id": "doc-1",
        "n": 42,
        "big": 2**40,
        "score": 2.25,
        "tags": ["a", "b", "a"],
        "blob": b"\x00\x01\xff",
        "nested": {"x": 1, "y": [True, None]},
        "ts": datetime(2026, 1, 2, 3, 4, 5, tzinfo=timezone.utc),
    }
    assert jb.loads(jb.dumps(doc)) == doc


def test_truncated_and_bad_version():
    with pytest.raises(ValueError, match="version"):
        jb.loads(bytes([9, 0x00]))
    with pytest.raises((ValueError, IndexError)):
        jb.loads(bytes([2, 0x22]) + b"a")  # str claims 2 bytes, has 1


def test_update_request_round_trip():
    docs = [{"id": "1", "title": ["t1a", "t1b"]}, {"id": "2", "n": 7}]
    data = jb.dump_update_request(
        docs, del_by_id=["9", "10"], del_by_q=["lang:fr"]
    )
    got = list(jb.iter_update_docs(data))
    assert [dict(d) for d in got] == docs
    by_id, by_q = jb.update_deletes(data)
    assert by_id == ["9", "10"]
    assert by_q == ["lang:fr"]


def test_solr_input_doc_children():
    parent = jb.SolrDoc({"id": "p"})
    parent.children.append(jb.SolrDoc({"id": "c1"}))
    back = jb.loads(jb.dumps(parent))
    assert dict(back) == {"id": "p"}
    assert [dict(c) for c in back.children] == [{"id": "c1"}]


def test_read_javabin_updates_spark(spark, tmp_path):
    d = tmp_path / "jbin"
    d.mkdir()
    (d / "a.bin").write_bytes(
        jb.dump_update_request([{"id": "1", "v": [1, 2]}, {"id": "2"}])
    )
    (d / "b.bin").write_bytes(jb.dump_update_request([{"id": "3", "s": "x"}]))
    out = jb.read_javabin_updates(spark, str(d)).collect()
    rows = sorted(r["fields"]["id"][0] for r in out)
    assert rows == ["1", "2", "3"]
    multi = {r["fields"]["id"][0]: r["fields"] for r in out}
    assert multi["1"]["v"] == ["1", "2"]
