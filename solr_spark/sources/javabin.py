"""JavaBin codec — Solr's default binary wire format, from scratch.

Reference: /root/reference/solr/solrj/src/java/org/apache/solr/common/util/
JavaBinCodec.java:1 (tag layout, vint/vlong encoding, extern-string cache)
and /root/reference/solr/core/src/java/org/apache/solr/handler/loader/
JavabinLoader.java:1 (the update-request consumption path, which
unmarshals JavaBinUpdateRequestCodec payloads —
solrj/.../request/JavaBinUpdateRequestCodec.java).

Format summary (public wire format, stream version 2):
- stream = version byte (2) + one value
- tag byte: upper 3 bits select the size-tagged types
  (STR=1, SINT=2, SLONG=3, ARR=4, ORDERED_MAP=5, NAMED_LST=6,
  EXTERN_STRING=7, each <<5); when upper bits are 000 the whole byte is
  a plain tag (NULL=0 .. MAP_ENTRY=19)
- size-tagged size: low 5 bits, 0x1f means "0x1f + vint follows"
- SINT/SLONG pack the low 4 bits into the tag; bit 0x10 flags a
  vint/vlong continuation of the REMAINING high bits
- vint/vlong: 7-bit groups, low group first, 0x80 continuation
- primitives are big-endian (DataOutputStream semantics)
- EXTERN_STRING: size==0 → a STR follows and joins the per-stream cache;
  size==n → reference to the n-th cached string (1-based). Used for
  NamedList / document field NAMES (values are plain STR).

The decoder is the loader's hot path; the encoder exists so tests can
round-trip spec vectors without SolrJ (this sandbox has no JVM client).
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession

VERSION = 2

NULL = 0
BOOL_TRUE = 1
BOOL_FALSE = 2
BYTE = 3
SHORT = 4
DOUBLE = 5
INT = 6
LONG = 7
FLOAT = 8
DATE = 9
MAP = 10
SOLRDOC = 11
SOLRDOCLST = 12
BYTEARR = 13
ITERATOR = 14
END = 15
SOLRINPUTDOC = 16
MAP_ENTRY_ITER = 17
ENUM_FIELD_VALUE = 18
MAP_ENTRY = 19

STR = 1 << 5
SINT = 2 << 5
SLONG = 3 << 5
ARR = 4 << 5
ORDERED_MAP = 5 << 5
NAMED_LST = 6 << 5
EXTERN_STRING = 7 << 5


class SolrDoc(dict):
    """A decoded SolrDocument / SolrInputDocument: a field dict with an
    optional ``children`` list (kept as a subclass so update pipelines can
    tell documents from plain maps)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.children: list["SolrDoc"] = []


class SolrDocList(list):
    """Decoded SolrDocumentList: docs plus the response metadata."""

    num_found: int = 0
    start: int = 0
    max_score: float | None = None


class _End:
    pass


_END = _End()


# ---------------------------------------------------------------------------
# decoder


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.strings: list[str] = []

    def _byte(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def _take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("javabin: truncated stream")
        self.pos += n
        return b

    def vint(self) -> int:
        b = self._byte()
        v = b & 0x7F
        shift = 7
        while b & 0x80:
            b = self._byte()
            v |= (b & 0x7F) << shift
            shift += 7
        return v

    def _size(self, tag: int) -> int:
        sz = tag & 0x1F
        if sz == 0x1F:
            sz += self.vint()
        return sz

    def read(self) -> Any:
        tag = self._byte()
        kind = tag >> 5
        if kind == STR >> 5:
            return self._take(self._size(tag)).decode("utf-8")
        if kind == SINT >> 5:
            v = tag & 0x0F
            if tag & 0x10:
                v = (self.vint() << 4) | v
            return v
        if kind == SLONG >> 5:
            v = tag & 0x0F
            if tag & 0x10:
                v = (self.vint() << 4) | v
            return v
        if kind == ARR >> 5:
            return [self.read() for _ in range(self._size(tag))]
        if kind == ORDERED_MAP >> 5 or kind == NAMED_LST >> 5:
            out: dict[str, Any] = {}
            for _ in range(self._size(tag)):
                name = self.read()
                out[name if name is not None else ""] = self.read()
            return out
        if kind == EXTERN_STRING >> 5:
            idx = self._size(tag)
            if idx:
                return self.strings[idx - 1]
            s = self.read()
            self.strings.append(s)
            return s
        # plain tags
        if tag == NULL:
            return None
        if tag == BOOL_TRUE:
            return True
        if tag == BOOL_FALSE:
            return False
        if tag == BYTE:
            return struct.unpack(">b", self._take(1))[0]
        if tag == SHORT:
            return struct.unpack(">h", self._take(2))[0]
        if tag == INT:
            return struct.unpack(">i", self._take(4))[0]
        if tag == LONG:
            return struct.unpack(">q", self._take(8))[0]
        if tag == FLOAT:
            return struct.unpack(">f", self._take(4))[0]
        if tag == DOUBLE:
            return struct.unpack(">d", self._take(8))[0]
        if tag == DATE:
            ms = struct.unpack(">q", self._take(8))[0]
            return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
        if tag == MAP:
            return {self.read(): self.read() for _ in range(self.vint())}
        if tag == BYTEARR:
            return self._take(self.vint())
        if tag == ITERATOR:
            out = []
            while True:
                v = self._read_or_end()
                if v is _END:
                    return out
                out.append(v)
        if tag == END:
            return _END
        if tag == SOLRINPUTDOC:
            return self._input_doc(self._size_plain())
        if tag == SOLRDOC:
            inner = self._byte()
            if inner >> 5 not in (ORDERED_MAP >> 5, NAMED_LST >> 5):
                raise ValueError("javabin: SOLRDOC without field block")
            return self._doc_fields(self._size(inner))
        if tag == SOLRDOCLST:
            meta = self.read()
            docs = self.read()
            out = SolrDocList(docs)
            out.num_found = int(meta[0]) if len(meta) > 0 else len(docs)
            out.start = int(meta[1]) if len(meta) > 1 else 0
            out.max_score = meta[2] if len(meta) > 2 else None
            return out
        if tag == MAP_ENTRY:
            return (self.read(), self.read())
        if tag == MAP_ENTRY_ITER:
            out = []
            while True:
                k = self._read_or_end()
                if k is _END:
                    return out
                out.append((k, self.read()))
        if tag == ENUM_FIELD_VALUE:
            return (self.read(), self.read())
        raise ValueError(f"javabin: unknown tag 0x{tag:02x}")

    def _size_plain(self) -> int:
        return self.vint()

    def _read_or_end(self) -> Any:
        return self.read()

    def _input_doc(self, sz: int) -> SolrDoc:
        """SolrInputDocument body: ``sz`` entries, each either a child
        document, a (deprecated) float doc-boost, or a name/value pair
        (JavaBinCodec.readSolrInputDocument's tolerant loop)."""
        doc = SolrDoc()
        i = 0
        while i < sz:
            obj = self.read()
            if isinstance(obj, SolrDoc):
                doc.children.append(obj)
                i += 1
                continue
            if isinstance(obj, float):  # legacy doc boost — skip
                i += 1
                continue
            doc[obj if obj is not None else ""] = self.read()
            i += 1
        return doc

    def _doc_fields(self, sz: int) -> SolrDoc:
        doc = SolrDoc()
        for _ in range(sz):
            obj = self.read()
            if isinstance(obj, SolrDoc):
                doc.children.append(obj)
                continue
            doc[obj if obj is not None else ""] = self.read()
        return doc


def loads(data: bytes) -> Any:
    r = _Reader(data)
    ver = r._byte()
    if ver != VERSION:
        raise ValueError(f"javabin: unsupported stream version {ver}")
    return r.read()


# ---------------------------------------------------------------------------
# encoder (test/round-trip side)


class _Writer:
    def __init__(self):
        self.out = bytearray([VERSION])
        self.cache: dict[str, int] = {}

    def vint(self, v: int) -> None:
        while v & ~0x7F:
            self.out.append((v & 0x7F) | 0x80)
            v >>= 7
        self.out.append(v)

    def tag(self, t: int, size: int) -> None:
        if t & 0xE0:
            if size < 0x1F:
                self.out.append(t | size)
            else:
                self.out.append(t | 0x1F)
                self.vint(size - 0x1F)
        else:
            self.out.append(t)
            self.vint(size)

    def string(self, s: str) -> None:
        b = s.encode("utf-8")
        self.tag(STR, len(b))
        self.out += b

    def extern_string(self, s: str | None) -> None:
        if s is None:
            self.out.append(NULL)
            return
        idx = self.cache.get(s)
        if idx is not None:
            self.tag(EXTERN_STRING, idx)
            return
        self.tag(EXTERN_STRING, 0)
        self.string(s)
        self.cache[s] = len(self.cache) + 1

    def write(self, v: Any) -> None:
        if v is None:
            self.out.append(NULL)
        elif v is True:
            self.out.append(BOOL_TRUE)
        elif v is False:
            self.out.append(BOOL_FALSE)
        elif isinstance(v, SolrDoc):
            self.tag(SOLRINPUTDOC, len(v) + len(v.children))
            for k, val in v.items():
                self.extern_string(k)
                self.write(val)
            for child in v.children:
                self.write(child)
        elif isinstance(v, int):
            if 0 <= v < (1 << 31):
                b = SINT | (v & 0x0F)
                if v > 0x0F:
                    self.out.append(b | 0x10)
                    self.vint(v >> 4)
                else:
                    self.out.append(b)
            elif -(1 << 31) <= v < (1 << 31):
                self.out.append(INT)
                self.out += struct.pack(">i", v)
            else:
                self.out.append(LONG)
                self.out += struct.pack(">q", v)
        elif isinstance(v, float):
            self.out.append(DOUBLE)
            self.out += struct.pack(">d", v)
        elif isinstance(v, str):
            self.string(v)
        elif isinstance(v, (bytes, bytearray)):
            # BYTEARR is a plain tag: byte 13 + vint size + raw bytes
            self.tag(BYTEARR, len(v))
            self.out += bytes(v)
        elif isinstance(v, datetime):
            self.out.append(DATE)
            ms = int(v.timestamp() * 1000)
            self.out += struct.pack(">q", ms)
        elif isinstance(v, dict):
            self.tag(ORDERED_MAP, len(v))
            for k, val in v.items():
                self.extern_string(str(k))
                self.write(val)
        elif isinstance(v, (list, tuple)):
            self.tag(ARR, len(v))
            for x in v:
                self.write(x)
        else:
            raise TypeError(f"javabin: cannot encode {type(v).__name__}")


def dumps(obj: Any) -> bytes:
    w = _Writer()
    w.write(obj)
    return bytes(w.out)


def dump_update_request(
    docs: list[dict],
    del_by_id: list[str] | None = None,
    del_by_q: list[str] | None = None,
) -> bytes:
    """Marshal an update request the way JavaBinUpdateRequestCodec does:
    a NamedList with delById/delByQ lists and the documents streamed as
    an ITERATOR of SOLRINPUTDOC values (JavaBinUpdateRequestCodec.marshal)."""
    w = _Writer()
    entries: list[tuple[str, Any]] = []
    if del_by_id:
        entries.append(("delById", list(del_by_id)))
    if del_by_q:
        entries.append(("delByQ", list(del_by_q)))
    entries.append(("docs", None))  # placeholder — docs stream last
    w.tag(NAMED_LST, len(entries))
    for name, val in entries:
        w.extern_string(name)
        if name == "docs":
            w.out.append(ITERATOR)
            for d in docs:
                sd = d if isinstance(d, SolrDoc) else SolrDoc(d)
                w.write(sd)
            w.out.append(END)
        else:
            w.write(val)
    return bytes(w.out)


def iter_update_docs(data: bytes) -> Iterator[SolrDoc]:
    """Decode an update-request payload and yield its documents
    (JavabinLoader.java:1 parseAndLoadDocs path): accepts either a bare
    SolrInputDocument stream member, a list of docs, or the NamedList
    update envelope with a docs iterator / docsMap."""
    top = loads(data)
    if isinstance(top, SolrDoc):
        yield top
        return
    if isinstance(top, list):
        for d in top:
            if isinstance(d, SolrDoc):
                yield d
        return
    if isinstance(top, dict):
        docs = top.get("docs")
        if isinstance(docs, list):
            for d in docs:
                if isinstance(d, SolrDoc):
                    yield d
        dm = top.get("docsMap")
        if isinstance(dm, list):
            for k, _v in dm:
                if isinstance(k, SolrDoc):
                    yield k


def update_deletes(data: bytes) -> tuple[list[str], list[str]]:
    """(delById, delByQ) of an update-request payload."""
    top = loads(data)
    if not isinstance(top, dict):
        return [], []
    by_id = top.get("delById") or []
    if isinstance(by_id, list) and by_id and isinstance(by_id[0], tuple):
        by_id = [k for k, _ in by_id]  # id→version MAP_ENTRY_ITER form
    return [str(x) for x in by_id], [str(x) for x in (top.get("delByQ") or [])]


def read_javabin_updates(spark: SparkSession, path: str) -> DataFrame:
    """JavabinLoader analog (handler/loader/JavabinLoader.java:1): each
    file holds one javabin update request; yields one row per document
    with the same map<string, array<string>> shape as the XML/CBOR
    loaders. Files scatter across executors (binaryFile source); decode
    is pure-Python per file inside mapInPandas — work scales with file
    count, nothing driver-side."""
    import pandas as pd

    src = spark.read.format("binaryFile").load(path).select("content")

    def parse_files(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for doc in iter_update_docs(bytes(blob)):
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
