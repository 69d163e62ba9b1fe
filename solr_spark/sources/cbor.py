"""Minimal CBOR (RFC 8949) decode — the CborLoader ingest path.

The reference accepts CBOR-encoded update payloads
(solr/core/src/java/org/apache/solr/handler/loader/CborLoader.java:1 —
it delegates wire decoding to Jackson's public CBOR dataformat). This
module implements the subset of RFC 8949 (a public IETF standard) that
document payloads use — unsigned/negative ints, byte/text strings,
arrays, maps, tags (unwrapped), false/true/null, half/single/double
floats, and indefinite-length containers — from scratch, with no
third-party codec.

Distributed shape mirrors the XML loader: whole files scatter across
executors via the binaryFile source and each file decodes inside
mapInPandas, so parse work scales with file count and nothing runs
driver-side.
"""

from __future__ import annotations

import struct
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_BREAK = object()


def _read_uint(buf: bytes, pos: int, info: int) -> tuple[int, int]:
    if info < 24:
        return info, pos
    if info == 24:
        return buf[pos], pos + 1
    if info == 25:
        return int.from_bytes(buf[pos : pos + 2], "big"), pos + 2
    if info == 26:
        return int.from_bytes(buf[pos : pos + 4], "big"), pos + 4
    if info == 27:
        return int.from_bytes(buf[pos : pos + 8], "big"), pos + 8
    if info == 31:
        return -1, pos  # indefinite-length marker
    raise ValueError(f"reserved additional-info value {info}")


def _half_to_float(h: int) -> float:
    """IEEE 754 binary16 → float (RFC 8949 appendix D reference logic)."""
    exp = (h >> 10) & 0x1F
    mant = h & 0x3FF
    if exp == 0:
        val = mant * 2.0**-24
    elif exp != 31:
        val = (mant + 1024) * 2.0 ** (exp - 25)
    else:
        val = float("inf") if mant == 0 else float("nan")
    return -val if h & 0x8000 else val


def _decode(buf: bytes, pos: int) -> tuple[Any, int]:
    ib = buf[pos]
    pos += 1
    major, info = ib >> 5, ib & 0x1F
    if major == 0:  # unsigned int
        return _read_uint(buf, pos, info)
    if major == 1:  # negative int
        n, pos = _read_uint(buf, pos, info)
        return -1 - n, pos
    if major == 2 or major == 3:  # byte / text string
        n, pos = _read_uint(buf, pos, info)
        if n < 0:  # indefinite: concatenation of definite chunks
            chunks = []
            while buf[pos] != 0xFF:
                c, pos = _decode(buf, pos)
                chunks.append(c)
            joined = (b"" if major == 2 else "").join(chunks)
            return joined, pos + 1
        raw = buf[pos : pos + n]
        return (bytes(raw) if major == 2 else raw.decode("utf-8")), pos + n
    if major == 4:  # array
        n, pos = _read_uint(buf, pos, info)
        out = []
        if n < 0:
            while buf[pos] != 0xFF:
                v, pos = _decode(buf, pos)
                out.append(v)
            return out, pos + 1
        for _ in range(n):
            v, pos = _decode(buf, pos)
            out.append(v)
        return out, pos
    if major == 5:  # map
        n, pos = _read_uint(buf, pos, info)
        out = {}
        if n < 0:
            while buf[pos] != 0xFF:
                k, pos = _decode(buf, pos)
                v, pos = _decode(buf, pos)
                out[k] = v
            return out, pos + 1
        for _ in range(n):
            k, pos = _decode(buf, pos)
            v, pos = _decode(buf, pos)
            out[k] = v
        return out, pos
    if major == 6:  # tag: decode and unwrap the tagged item
        _tag, pos = _read_uint(buf, pos, info)
        return _decode(buf, pos)
    # major 7: simple values + floats
    if info == 20:
        return False, pos
    if info == 21:
        return True, pos
    if info in (22, 23):
        return None, pos
    if info == 24:
        return buf[pos], pos + 1  # simple value (one byte)
    if info == 25:
        return _half_to_float(int.from_bytes(buf[pos : pos + 2], "big")), pos + 2
    if info == 26:
        return struct.unpack(">f", buf[pos : pos + 4])[0], pos + 4
    if info == 27:
        return struct.unpack(">d", buf[pos : pos + 8])[0], pos + 8
    if info == 31:
        raise ValueError("unexpected break code")
    return info, pos  # simple value < 20


def loads(data: bytes) -> Any:
    """Decode one CBOR data item."""
    val, end = _decode(bytes(data), 0)
    return val


def iter_items(data: bytes):
    """Decode a CBOR sequence (RFC 8742: back-to-back data items)."""
    buf, pos = bytes(data), 0
    while pos < len(buf):
        val, pos = _decode(buf, pos)
        yield val


# --------------------------------------------------------------------------
# test-support encoder (round-trip checks only — the engine never encodes)


def dumps(obj: Any) -> bytes:
    if obj is False:
        return b"\xf4"
    if obj is True:
        return b"\xf5"
    if obj is None:
        return b"\xf6"
    if isinstance(obj, int):
        major, n = (0, obj) if obj >= 0 else (1, -1 - obj)
        return _head(major, n)
    if isinstance(obj, float):
        return b"\xfb" + struct.pack(">d", obj)
    if isinstance(obj, bytes):
        return _head(2, len(obj)) + obj
    if isinstance(obj, str):
        raw = obj.encode("utf-8")
        return _head(3, len(raw)) + raw
    if isinstance(obj, (list, tuple)):
        return _head(4, len(obj)) + b"".join(dumps(v) for v in obj)
    if isinstance(obj, dict):
        return _head(5, len(obj)) + b"".join(
            dumps(k) + dumps(v) for k, v in obj.items()
        )
    raise TypeError(f"cannot encode {type(obj)}")


def _head(major: int, n: int) -> bytes:
    if n < 24:
        return bytes([(major << 5) | n])
    for info, size in ((24, 1), (25, 2), (26, 4), (27, 8)):
        if n < 1 << (8 * size):
            return bytes([(major << 5) | info]) + n.to_bytes(size, "big")
    raise ValueError("length too large")


def read_cbor_updates(spark: SparkSession, path: str) -> DataFrame:
    """CborLoader analog: each file holds one CBOR array of document maps
    (or a CBOR sequence of maps); yields one row per document with the
    same map<string, array<string>> shape as the XML loader — multivalued
    fields keep all values, scalars stringify."""
    import pandas as pd

    src = spark.read.format("binaryFile").load(path).select("content")

    def parse_files(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                top = list(iter_items(bytes(blob)))
                docs = []
                for item in top:
                    if isinstance(item, list):
                        docs.extend(item)
                    else:
                        docs.append(item)
                for doc in docs:
                    if not isinstance(doc, dict):
                        continue
                    fields = {}
                    for k, v in doc.items():
                        vals = v if isinstance(v, list) else [v]
                        fields[str(k)] = [
                            "" if x is None else str(x) for x in vals
                        ]
                    rows.append({"fields": fields})
            if rows:
                yield pd.DataFrame(rows)

    return src.mapInPandas(parse_files, "fields map<string, array<string>>")
