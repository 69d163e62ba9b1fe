"""Response writers beyond JSON/CSV: XML, CBOR, javabin, Smile, GeoJSON,
GraphML.

Reference (paths under /root/reference/solr/core/src/java/org/apache/solr/response/):
- XMLWriter.java / XMLResponseWriter.java (wt=xml envelope)
- CborResponseWriter.java (wt=cbor)
- BinaryResponseWriter.java (wt=javabin)
- SmileResponseWriter.java (wt=smile — sources/smile.py from-scratch codec)
- GeoJSONResponseWriter.java (wt=geojson — features from a lat/lon or
  geometry field)
- GraphMLResponseWriter.java (streams a gatherNodes() traversal as
  GraphML nodes + ancestor edges)

Like write_response (sources/__init__.py), these are driver-side BY
DESIGN: response writing is the final, page-sized step after the engine
has already reduced the result to top-k/page rows. Bulk exports go
through write_commit (parquet) instead.
"""

from __future__ import annotations

import json
from xml.sax.saxutils import escape, quoteattr

from pyspark.sql import DataFrame


def _page(df: DataFrame, rows: int | None, start: int):
    pdf = df.toPandas()
    n_found = len(pdf)
    if rows is not None:
        pdf = pdf.iloc[start : start + rows]
    return pdf, n_found


def _xml_val(tag_name: str, name: str, v) -> str:
    return f"<{tag_name} name={quoteattr(name)}>{escape(str(v))}</{tag_name}>"


def write_xml_response(
    df: DataFrame, rows: int | None = 10, start: int = 0
) -> str:
    """wt=xml (XMLWriter.java): the <response><result ...><doc> envelope;
    typed element names follow the writer's primitive mapping (int/long →
    <int>/<long>, float/double → <float>/<double>, bool → <bool>,
    else <str>; multivalued → <arr>)."""
    import numpy as np

    pdf, n_found = _page(df, rows, start)

    def elem(name, v):
        if isinstance(v, (bool, np.bool_)):
            return _xml_val("bool", name, str(bool(v)).lower())
        if isinstance(v, (int, np.integer)):
            iv = int(v)
            # int32 range is [-2**31, 2**31-1]; anything outside is <long>
            tag = "int" if -(2**31) <= iv <= 2**31 - 1 else "long"
            return _xml_val(tag, name, iv)
        if isinstance(v, (float, np.floating)):
            return _xml_val("double", name, float(v))
        if isinstance(v, (list, tuple, np.ndarray)):
            inner = "".join(elem("", x).replace(' name=""', "") for x in v)
            return f"<arr name={quoteattr(name)}>{inner}</arr>"
        return _xml_val("str", name, v)

    docs = []
    for _, row in pdf.iterrows():
        fields = "".join(elem(k, v) for k, v in row.items() if v is not None)
        docs.append(f"<doc>{fields}</doc>")
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n<response>'
        '<lst name="responseHeader"><int name="status">0</int></lst>'
        f'<result name="response" numFound="{n_found}" start="{start}">'
        + "".join(docs)
        + "</result></response>"
    )


def write_cbor_response(
    df: DataFrame, rows: int | None = 10, start: int = 0
) -> bytes:
    """wt=cbor (CborResponseWriter.java): the JSON envelope shape encoded
    with the from-scratch RFC 8949 codec (sources/cbor.py)."""
    from . import cbor

    pdf, n_found = _page(df, rows, start)
    docs = [
        {k: (v.tolist() if hasattr(v, "tolist") else v) for k, v in r.items()}
        for r in pdf.to_dict(orient="records")
    ]
    return cbor.dumps(
        {
            "responseHeader": {"status": 0},
            "response": {"numFound": n_found, "start": start, "docs": docs},
        }
    )


def write_javabin_response(
    df: DataFrame, rows: int | None = 10, start: int = 0
) -> bytes:
    """wt=javabin (BinaryResponseWriter.java): the response envelope in
    the JavaBin wire format (sources/javabin.py). Docs are written as
    ordered maps — the decoder-visible structure BinaryResponseWriter
    produces for SolrDocumentList consumers."""
    from . import javabin

    pdf, n_found = _page(df, rows, start)
    docs = [
        {
            k: (v.tolist() if hasattr(v, "tolist") else v)
            for k, v in r.items()
        }
        for r in pdf.to_dict(orient="records")
    ]
    return javabin.dumps(
        {
            "responseHeader": {"status": 0},
            "response": {"numFound": n_found, "start": start, "docs": docs},
        }
    )


def write_geojson(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    rows: int | None = 10,
    start: int = 0,
) -> str:
    """wt=geojson (GeoJSONResponseWriter.java): a FeatureCollection with
    one Point feature per row; every non-geometry column becomes a
    feature property. Coordinates are GeoJSON order [lon, lat]."""
    pdf, n_found = _page(df, rows, start)
    feats = []
    for r in pdf.to_dict(orient="records"):
        lat, lon = r.pop(lat_col), r.pop(lon_col)
        props = {
            k: (v.tolist() if hasattr(v, "tolist") else v) for k, v in r.items()
        }
        feats.append(
            {
                "type": "Feature",
                "geometry": {
                    "type": "Point",
                    "coordinates": [float(lon), float(lat)],
                },
                "properties": props,
            }
        )
    return json.dumps(
        {"type": "FeatureCollection", "numFound": n_found, "features": feats},
        default=str,
    )


def write_graphml(
    df: DataFrame,
    node_col: str = "node",
    ancestors_col: str | None = "ancestors",
    field_cols: tuple[str, ...] = (),
) -> str:
    """GraphML writer (GraphMLResponseWriter.java): one <node> per row,
    one directed <edge> per (ancestor → node) pair — exactly the shape
    the reference streams for gatherNodes()/graph_expand results.
    ``field_cols`` become <data> keys on each node."""
    pdf = df.toPandas()
    keys = "".join(
        f'<key id={quoteattr(c)} for="node" attr.name={quoteattr(c)} '
        'attr.type="string"/>'
        for c in field_cols
    )
    nodes, edges = [], []
    seen: set[str] = set()
    for r in pdf.to_dict(orient="records"):
        nid = str(r[node_col])
        if nid not in seen:
            seen.add(nid)
            data = "".join(
                f"<data key={quoteattr(c)}>{escape(str(r[c]))}</data>"
                for c in field_cols
                if r.get(c) is not None
            )
            nodes.append(f"<node id={quoteattr(nid)}>{data}</node>")
        anc = r.get(ancestors_col) if ancestors_col else None
        if anc is not None:
            anc_list = anc.tolist() if hasattr(anc, "tolist") else anc
            for a in anc_list or []:
                aid = str(a)
                if aid not in seen:
                    seen.add(aid)
                    nodes.append(f"<node id={quoteattr(aid)}/>")
                edges.append(
                    f"<edge source={quoteattr(aid)} target={quoteattr(nid)}/>"
                )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">'
        + keys
        + '<graph edgedefault="directed">'
        + "".join(nodes)
        + "".join(edges)
        + "</graph></graphml>"
    )


def write_smile_response(
    df: DataFrame, rows: int | None = 10, start: int = 0
) -> bytes:
    """wt=smile (SmileResponseWriter.java): the same envelope encoded
    with the from-scratch Smile codec (sources/smile.py)."""
    from . import smile

    pdf, n_found = _page(df, rows, start)
    docs = [
        {k: (v.tolist() if hasattr(v, "tolist") else v) for k, v in r.items()}
        for r in pdf.to_dict(orient="records")
    ]
    return smile.dumps(
        {
            "responseHeader": {"status": 0},
            "response": {"numFound": n_found, "start": start, "docs": docs},
        }
    )
