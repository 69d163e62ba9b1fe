"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's rich-document path (Tika extraction, SURVEY.md §2.1,
/root/reference/solr/modules/extraction/) converts binary blobs to text
server-side. A training-data pipeline needs the same shape for
image/audio/video: a ``binary`` column plus typed metadata, processed by
Arrow-batched kernels.

The actual media decode (PIL/libsndfile/ffmpeg) is NOT available in this
container — the decode step is STUBBED behind ``DECODERS`` with a
deterministic fake, but the Spark-side plumbing is real and tested:
schema, mapInPandas batch shape, partition sizing, error channeling.
Swap a real decoder into DECODERS and nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<mime:string, declared_w:int, declared_h:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, ok boolean, error string, "
    "sha256 string, n_bytes bigint, width int, height int, "
    "n_frames int, feature array<float>"
)


def _fake_decode_image(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: derives fake
    dimensions + a 8-dim feature from the payload hash. Replace with a
    real PIL/turbojpeg decode in production — same signature."""
    h = hashlib.sha256(payload).digest()
    rng = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    return {
        "width": 16 + int(h[0]) % 64,
        "height": 16 + int(h[1]) % 64,
        "n_frames": 1,
        "feature": (rng[:8] / 255.0).tolist(),
    }


def _unavailable(_: bytes) -> dict:
    raise NotImplementedError(
        "media decoder not available in this environment — install the "
        "codec library and register it in multimodal.DECODERS"
    )


DECODERS: dict[str, Callable[[bytes], dict]] = {
    "image": _fake_decode_image,   # deterministic fake (see docstring)
    "audio": _unavailable,         # STUB: needs libsndfile/soundfile
    "video": _unavailable,         # STUB: needs ffmpeg
}


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over a MEDIA_SCHEMA table. Decode
    failures are channeled into (ok=false, error=...) rows instead of
    failing the task — at 100 TB a single corrupt blob must not kill a
    stage. Batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch; payloads stay off the
    driver entirely."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {
                "media_id": pdf["media_id"].to_numpy(np.int64),
                "kind": pdf["kind"],
                "ok": np.zeros(len(pdf), dtype=bool),
                "error": [None] * len(pdf),
                "sha256": [None] * len(pdf),
                "n_bytes": np.zeros(len(pdf), dtype=np.int64),
                "width": np.zeros(len(pdf), dtype=np.int32),
                "height": np.zeros(len(pdf), dtype=np.int32),
                "n_frames": np.zeros(len(pdf), dtype=np.int32),
                "feature": [None] * len(pdf),
            }
            for i, (kind, payload) in enumerate(zip(pdf["kind"], pdf["payload"])):
                payload = bytes(payload) if payload is not None else b""
                out["sha256"][i] = hashlib.sha256(payload).hexdigest()
                out["n_bytes"][i] = len(payload)
                dec = DECODERS.get(kind)
                if dec is None:
                    out["error"][i] = f"no decoder for kind={kind!r}"
                    continue
                try:
                    meta = dec(payload)
                except NotImplementedError as e:
                    out["error"][i] = str(e)
                    continue
                out["ok"][i] = True
                out["width"][i] = meta.get("width", 0)
                out["height"][i] = meta.get("height", 0)
                out["n_frames"][i] = meta.get("n_frames", 0)
                out["feature"][i] = meta.get("feature")
            yield pd.DataFrame(out)

    return media.mapInPandas(kern, FEATURE_SCHEMA)


def synthesize_media(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Build a MEDIA_SCHEMA table from a text table (payload = utf-8 bytes
    of the text) — lets the plumbing be exercised without real media."""
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(0).alias("declared_w"),
            F.lit(0).alias("declared_h"),
            F.lit(0).alias("duration_ms"),
        ).alias("meta"),
    )
