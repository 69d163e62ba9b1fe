"""From-scratch Smile codec (the Jackson binary-JSON wire format).

Reference parity: Solr's wt=smile response writer
(solr/core/src/java/org/apache/solr/response/SmileResponseWriter.java:1
wraps Jackson's SmileGenerator). This module implements the format from
the PUBLIC specification (FasterXML smile-format-specification): the
":)\\n" header, token-class value encoding (tiny/short ASCII + Unicode
strings, zigzag vints, 7-bit-packed IEEE doubles), short key names and
object/array framing.

Scope (documented): the no-back-references subset — header flag byte
0x00 disables shared property names and shared string values, which the
spec makes optional-at-writer-discretion; every mainstream decoder
(including Jackson's) accepts such streams. Long (>64-byte) strings use
the 0xE0/0xE4 variable-length forms terminated by 0xFC. Raw binary and
BigInteger/BigDecimal are not emitted (the response envelope never
produces them); the decoder raises loudly on their lead bytes.
"""

from __future__ import annotations

import struct
from typing import Any

HEADER = b":)\n\x00"  # version 0, no shared names/values, no raw binary

_END_STRING = 0xFC
_START_ARRAY, _END_ARRAY = 0xF8, 0xF9
_START_OBJECT, _END_OBJECT = 0xFA, 0xFB


# --------------------------------------------------------------------------
# primitives


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else (n << 1)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _vint(n: int) -> bytes:
    """Smile vint: 7 data bits per byte, most-significant group first;
    the LAST byte carries only 6 bits and has its high bit set."""
    out = bytearray([0x80 | (n & 0x3F)])
    n >>= 6
    while n:
        out.append(n & 0x7F)
        n >>= 7
    return bytes(reversed(out))


def _read_vint(buf: bytes, pos: int) -> tuple[int, int]:
    n = 0
    while True:
        b = buf[pos]
        pos += 1
        if b & 0x80:
            return (n << 6) | (b & 0x3F), pos
        n = (n << 7) | b


def _pack7(raw: bytes, total_bits: int) -> bytes:
    """Pack big-endian bytes into the spec's 7-bits-per-byte layout,
    first byte holding the remainder bits."""
    n = int.from_bytes(raw, "big")
    n_bytes = (total_bits + 6) // 7
    out = bytearray(n_bytes)
    for i in range(n_bytes - 1, -1, -1):
        out[i] = n & 0x7F
        n >>= 7
    return bytes(out)


def _unpack7(buf: bytes, pos: int, total_bits: int, width: int) -> tuple[bytes, int]:
    n_bytes = (total_bits + 6) // 7
    n = 0
    for i in range(n_bytes):
        n = (n << 7) | (buf[pos + i] & 0x7F)
    return n.to_bytes(width, "big"), pos + n_bytes


# --------------------------------------------------------------------------
# encoder


def _write_value(out: bytearray, v: Any) -> None:
    if v is None:
        out.append(0x21)
    elif v is True:
        out.append(0x23)
    elif v is False:
        out.append(0x22)
    elif isinstance(v, int):
        z = _zigzag(v)
        if -16 <= v <= 15:
            out.append(0xC0 + z)  # small int
        elif -(2**31) <= v < 2**31:
            out.append(0x24)
            out += _vint(z)
        else:
            out.append(0x25)
            out += _vint(z)
    elif isinstance(v, float):
        out.append(0x29)
        out += _pack7(struct.pack(">d", v), 64)
    elif isinstance(v, str):
        _write_string(out, v)
    elif isinstance(v, (list, tuple)):
        out.append(_START_ARRAY)
        for x in v:
            _write_value(out, x)
        out.append(_END_ARRAY)
    elif isinstance(v, dict):
        out.append(_START_OBJECT)
        for k, x in v.items():
            _write_key(out, str(k))
            _write_value(out, x)
        out.append(_END_OBJECT)
    else:
        _write_string(out, str(v))


def _write_string(out: bytearray, s: str) -> None:
    b = s.encode("utf-8")
    is_ascii = len(b) == len(s)
    if not b:
        out.append(0x20)  # empty string
    elif is_ascii and len(b) <= 32:
        out.append(0x40 + len(b) - 1)  # tiny ASCII
        out += b
    elif is_ascii and len(b) <= 64:
        out.append(0x60 + len(b) - 33)  # small ASCII
        out += b
    elif not is_ascii and 2 <= len(b) <= 33:
        out.append(0x80 + len(b) - 2)  # tiny Unicode
        out += b
    elif not is_ascii and len(b) <= 65:
        out.append(0xA0 + len(b) - 34)  # small Unicode
        out += b
    else:
        out.append(0xE0 if is_ascii else 0xE4)  # long (variable) string
        out += b
        out.append(_END_STRING)


def _write_key(out: bytearray, s: str) -> None:
    b = s.encode("utf-8")
    is_ascii = len(b) == len(s)
    if not b:
        out.append(0x20)  # empty name
    elif is_ascii and 1 <= len(b) <= 64:
        out.append(0x80 + len(b) - 1)  # short ASCII name
        out += b
    elif not is_ascii and 2 <= len(b) <= 57:
        out.append(0xC0 + len(b) - 2)  # short Unicode name
        out += b
    else:
        out.append(0x34)  # long Unicode name
        out += b
        out.append(_END_STRING)


def dumps(value: Any) -> bytes:
    """Encode a JSON-shaped python value as a Smile document."""
    out = bytearray(HEADER)
    _write_value(out, value)
    return bytes(out)


# --------------------------------------------------------------------------
# decoder


def loads(data: bytes) -> Any:
    if data[:3] != HEADER[:3]:
        raise ValueError("not a Smile document (missing ':)\\n' header)")
    v, pos = _read_value(data, 4)
    return v


def _read_string_until_fc(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(_END_STRING, pos)
    return buf[pos:end].decode("utf-8"), end + 1


def _read_value(buf: bytes, pos: int) -> tuple[Any, int]:
    t = buf[pos]
    pos += 1
    if t == 0x20:
        return "", pos
    if t == 0x21:
        return None, pos
    if t == 0x22:
        return False, pos
    if t == 0x23:
        return True, pos
    if t in (0x24, 0x25):
        z, pos = _read_vint(buf, pos)
        return _unzigzag(z), pos
    if t == 0x28:
        raw, pos = _unpack7(buf, pos, 32, 4)
        return struct.unpack(">f", raw)[0], pos
    if t == 0x29:
        raw, pos = _unpack7(buf, pos, 64, 8)
        return struct.unpack(">d", raw)[0], pos
    if 0x40 <= t <= 0x5F:
        n = t - 0x40 + 1
        return buf[pos : pos + n].decode("ascii"), pos + n
    if 0x60 <= t <= 0x7F:
        n = t - 0x60 + 33
        return buf[pos : pos + n].decode("ascii"), pos + n
    if 0x80 <= t <= 0x9F:
        n = t - 0x80 + 2
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if 0xA0 <= t <= 0xBF:
        n = t - 0xA0 + 34
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if 0xC0 <= t <= 0xDF:
        return _unzigzag(t - 0xC0), pos
    if t in (0xE0, 0xE4):
        return _read_string_until_fc(buf, pos)
    if t == _START_ARRAY:
        out = []
        while buf[pos] != _END_ARRAY:
            v, pos = _read_value(buf, pos)
            out.append(v)
        return out, pos + 1
    if t == _START_OBJECT:
        obj = {}
        while buf[pos] != _END_OBJECT:
            k, pos = _read_key(buf, pos)
            v, pos = _read_value(buf, pos)
            obj[k] = v
        return obj, pos + 1
    raise ValueError(f"unsupported Smile value token 0x{t:02x} at {pos - 1}")


def _read_key(buf: bytes, pos: int) -> tuple[str, int]:
    t = buf[pos]
    pos += 1
    if t == 0x20:
        return "", pos
    if 0x80 <= t <= 0xBF:
        n = t - 0x80 + 1
        return buf[pos : pos + n].decode("ascii"), pos + n
    if 0xC0 <= t <= 0xF7:
        n = t - 0xC0 + 2
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if t == 0x34:
        return _read_string_until_fc(buf, pos)
    raise ValueError(f"unsupported Smile key token 0x{t:02x} at {pos - 1}")
