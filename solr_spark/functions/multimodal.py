"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's rich-document path (Tika extraction, SURVEY.md §2.1,
/root/reference/solr/modules/extraction/) converts binary blobs to text
server-side. A training-data pipeline needs the same shape for
image/audio/video: a ``binary`` column plus typed metadata, processed by
Arrow-batched kernels.

Codec libraries (PIL/libsndfile/ffmpeg) are NOT available in this
container. The image path REALLY decodes uncompressed binary netpbm
(P6/P5 — header parse + numpy frombuffer, nearest-neighbor thumbnail,
channel statistics); compressed image formats and audio/video are
STUBBED behind ``DECODERS`` (deterministic fake / NotImplementedError),
while the Spark-side plumbing — schema, mapInPandas batch shape,
partition sizing, error channeling — is real and tested end-to-end.
Swap a full decoder into DECODERS and nothing else changes.
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


def decode_netpbm(payload: bytes) -> dict:
    """REAL image decode for binary netpbm (P6 RGB / P5 grayscale — the
    public uncompressed format, no codec library needed): numpy header
    parse + frombuffer, then a nearest-neighbor 2x2 grayscale thumbnail
    (index-array resize) and per-channel statistics as the 8-dim
    feature: [thumb(4), mean_r, mean_g, mean_b, std_gray] in [0,1]."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary netpbm payload: {magic!r}")
    # header tokens: magic, width, height, maxval — whitespace separated,
    # '#' comments to end-of-line allowed (the netpbm spec)
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raw samples
    w, h, maxval = tokens
    if not (0 < maxval <= 255):
        # 2-byte-per-sample netpbm (maxval > 255) would silently decode
        # as garbage under a uint8 read; raise like decode_wav does for
        # unsupported sample widths
        raise ValueError(f"unsupported netpbm maxval {maxval} (need 1..255)")
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    raw = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    img = raw.reshape(h, w, channels).astype(np.float32) / float(maxval)
    gray = img.mean(axis=2)
    ri = np.linspace(0, h - 1, 2).astype(np.int64)
    ci = np.linspace(0, w - 1, 2).astype(np.int64)
    thumb = gray[np.ix_(ri, ci)].reshape(-1)
    if channels == 3:
        ch_means = img.mean(axis=(0, 1))
    else:
        ch_means = np.repeat(gray.mean(), 3)
    feature = np.concatenate([thumb, ch_means, [gray.std()]]).astype(np.float32)
    return {
        "width": w,
        "height": h,
        "n_frames": 1,
        "feature": [float(x) for x in feature],
    }


def _decode_image(payload: bytes) -> dict:
    """Image decode dispatch: REAL decode for uncompressed netpbm
    payloads; compressed formats (jpeg/png/...) would need codec libs
    absent from this container, so other payloads take the deterministic
    fake (documented stub)."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_netpbm(payload)
    return _fake_decode_image(payload)


def make_ppm(width: int, height: int, seed: int) -> bytes:
    """Deterministic P6 test image (seeded gradient + noise)."""
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 255, width, dtype=np.float64)
    y = np.linspace(0, 255, height, dtype=np.float64)
    r = np.tile(x, (height, 1))
    g = np.tile(y[:, None], (1, width))
    b = rng.integers(0, 256, (height, width)).astype(np.float64)
    img = np.stack([r, g, b], axis=2).astype(np.uint8)
    return b"P6\n# test\n%d %d\n255\n" % (width, height) + img.tobytes()


def decode_wav(payload: bytes) -> dict:
    """REAL audio decode for PCM WAV (RIFF) via the stdlib ``wave``
    module + numpy — no codec library required. Feature vector:
    [duration_s, rms, zero-crossing rate, peak] over the mono mix;
    n_frames carries the sample count, width/height stay 0 for audio."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    dur = len(x) / rate if rate else 0.0
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
    peak = float(np.abs(x).max()) if len(x) else 0.0
    return {
        "width": 0,
        "height": 0,
        "n_frames": int(n),
        "feature": [float(dur), rms, zcr, peak],
    }


def _decode_audio(payload: bytes) -> dict:
    """Audio dispatch: REAL decode for RIFF/WAV PCM; compressed codecs
    (mp3/ogg/flac) need libraries absent from this container."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError(
        "only PCM WAV decodes without codec libraries — install "
        "libsndfile/soundfile and register it in multimodal.DECODERS"
    )


def make_wav(seconds: float, freq: float, rate: int = 8000, seed: int = 0) -> bytes:
    """Deterministic PCM WAV test clip (sine + seeded noise)."""
    import io
    import wave

    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * rate)) / rate
    x = 0.5 * np.sin(2 * np.pi * freq * t) + 0.01 * rng.standard_normal(len(t))
    pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


FRAME_SAMPLE_EVERY = 2  # video frame-sampling stride (decode every Nth)


def _ppm_size(payload: bytes, pos: int) -> tuple[int, int]:
    """(frame_end, header_end) offsets of the P6 frame starting at pos."""
    p, tokens = pos + 2, []
    while len(tokens) < 3:
        while payload[p : p + 1].isspace():
            p += 1
        if payload[p : p + 1] == b"#":
            while payload[p : p + 1] != b"\n":
                p += 1
            continue
        s = p
        while p < len(payload) and not payload[p : p + 1].isspace():
            p += 1
        tokens.append(int(payload[s:p]))
    p += 1
    w, h, _ = tokens
    return p + w * h * 3, p


def decode_ppm_stream(payload: bytes, sample_every: int = FRAME_SAMPLE_EVERY) -> dict:
    """REAL video decode for an uncompressed concatenated-P6 frame stream
    (the MJPEG-without-compression shape): walk the frame headers to
    count ALL frames, but DECODE only every ``sample_every``-th — the
    frame-sampling pattern a training pipeline applies to video (decode
    cost scales with sampled frames, not stream length). Feature = the
    element-wise mean of the sampled frames' image features; width/height
    from the first frame."""
    if payload[:2] != b"P6":
        raise ValueError("not a concatenated-P6 stream")
    pos, idx = 0, 0
    feats, w0, h0 = [], 0, 0
    while pos < len(payload) and payload[pos : pos + 2] == b"P6":
        end, _hdr = _ppm_size(payload, pos)
        if idx % sample_every == 0:
            m = decode_netpbm(payload[pos:end])
            feats.append(m["feature"])
            if idx == 0:
                w0, h0 = m["width"], m["height"]
        pos, idx = end, idx + 1
    mean_feat = np.mean(np.asarray(feats, dtype=np.float64), axis=0)
    return {
        "width": w0,
        "height": h0,
        "n_frames": idx,
        "feature": [float(x) for x in mean_feat],
    }


def _decode_video(payload: bytes) -> dict:
    """Video dispatch: REAL frame-sampled decode for uncompressed
    concatenated-P6 streams; compressed containers need ffmpeg."""
    if payload[:2] == b"P6":
        return decode_ppm_stream(payload)
    raise NotImplementedError(
        "only uncompressed concatenated-P6 streams decode without codec "
        "libraries — install ffmpeg bindings and register them in "
        "multimodal.DECODERS"
    )


def _unavailable(_: bytes) -> dict:
    raise NotImplementedError(
        "media decoder not available in this environment — install the "
        "codec library and register it in multimodal.DECODERS"
    )


DECODERS: dict[str, Callable[[bytes], dict]] = {
    "image": _decode_image,        # REAL for netpbm; fake for compressed
    "audio": _decode_audio,        # REAL for PCM WAV; stub for compressed
    "video": _decode_video,        # REAL frame-sampling for P6 streams; stub otherwise
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
                except Exception as e:  # corrupt blob / missing codec:
                    # an error ROW, never a task failure (the 100-TB
                    # contract this module promises)
                    out["error"][i] = f"{type(e).__name__}: {e}"
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
