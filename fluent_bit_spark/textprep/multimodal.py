"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct.
The decode step itself needs codec libraries that are NOT in this
environment, so it is stubbed (NotImplementedError / deterministic
fake) — but all the Spark-side plumbing is real and tested:

- schema: (id, payload binary, meta struct)
- binary_meta: header sniffing (magic bytes -> media type) as pure
  Catalyst expressions — runs at full scan speed, no Python.
- extract_features / sample_frames: Arrow-batched ``mapInPandas``
  with the correct batch shapes, partition-preserving, returning
  typed rows. Swap `_decode_stub` for a real decoder (PIL/ffmpeg)
  and nothing else changes.

Scale: mapInPandas streams Arrow batches; memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — for 100 MB video
payloads set it low (e.g. 16) so a batch fits the executor.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff",  # wav/avi/webp container
    b"\x1aE\xdf\xa3": "mkv",
    b"OggS": "ogg",
    b"fLaC": "flac",
    b"ID3": "mp3",
}


def binary_meta(
    df: DataFrame, payload_col: str = "payload", prefix: str = "media"
) -> DataFrame:
    """Header-sniffed metadata columns, pure Catalyst (no decode):
    <prefix>_bytes, <prefix>_magic (hex of first 4 bytes),
    <prefix>_type (magic-byte classification)."""
    p = F.col(payload_col)
    media_type = F.lit("unknown")
    for magic, name in MAGIC.items():
        hexmagic = magic.hex()
        media_type = F.when(
            F.hex(F.expr(f"substring({payload_col}, 1, {len(magic)})"))
            == hexmagic.upper(),
            F.lit(name),
        ).otherwise(media_type)
    return (
        df.withColumn(f"{prefix}_bytes", F.length(p).cast("bigint"))
        .withColumn(f"{prefix}_magic", F.lower(F.hex(F.expr(f"substring({payload_col}, 1, 4)"))))
        .withColumn(f"{prefix}_type", media_type)
    )


def decode_header(payload: bytes) -> dict[str, Any] | None:
    """REAL container-header decode, stdlib-only (no codec libraries):
    PNG IHDR, GIF logical screen descriptor, JPEG SOF scan, RIFF/WAVE
    fmt chunk. Returns None for unrecognized payloads (pixel/sample
    decoding of compressed streams still needs real codec libs — that
    part stays behind ``_decode_stub``)."""
    import struct

    if (
        payload.startswith(b"\x89PNG\r\n\x1a\n")
        and len(payload) >= 24
        and payload[12:16] == b"IHDR"
    ):
        w, h = struct.unpack(">II", payload[16:24])
        return {"media_type": "png", "width": w, "height": h}
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return {"media_type": "gif", "width": w, "height": h}
    if payload.startswith(b"\xff\xd8"):
        i = 2
        while i + 9 <= len(payload) and payload[i] == 0xFF:
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return {"media_type": "jpeg", "width": w, "height": h}
            i += 2 + seglen
        return {"media_type": "jpeg"}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        i = 12
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            sz = struct.unpack("<I", payload[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 16 <= len(payload):
                _fmt, ch, rate = struct.unpack("<HHI", payload[i + 8 : i + 16])
                return {"media_type": "wav", "channels": ch, "sample_rate": rate}
            i += 8 + sz + (sz & 1)
        return {"media_type": "wav"}
    return None


DECODE_SCHEMA = (
    "id bigint, media_type string, width int, height int, "
    "channels int, sample_rate int"
)


def decode_meta(
    df: DataFrame, id_col: str = "id", payload_col: str = "payload"
) -> DataFrame:
    """Real header decode over Arrow batches: one row per payload with
    the container's own dimensions/audio params (null where the field
    doesn't apply or the container is unknown)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                meta = decode_header(raw) or {"media_type": "unknown"}
                out.append(
                    {
                        "id": int(rid),
                        "media_type": meta.get("media_type"),
                        "width": meta.get("width"),
                        "height": meta.get("height"),
                        "channels": meta.get("channels"),
                        "sample_rate": meta.get("sample_rate"),
                    }
                )
            yield pd.DataFrame(out).astype(
                {
                    "width": "Int32",
                    "height": "Int32",
                    "channels": "Int32",
                    "sample_rate": "Int32",
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, DECODE_SCHEMA)


def _decode_stub(payload: bytes, deterministic_fake: bool) -> dict[str, Any]:
    """STUB for the real codec call (PIL/opencv/ffmpeg not available
    in this container). ``deterministic_fake`` yields a stable fake
    "decoded" result that is a pure function of the payload bytes so
    tests and oracles are reproducible."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "environment; pass deterministic_fake=True or plug a real decoder"
        )
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0
    return {"width": 16 + checksum % 64, "height": 16 + (checksum * 7) % 64, "n_bytes": n}


FEATURE_SCHEMA = (
    "id bigint, n_bytes bigint, width int, height int, feat array<double>"
)


def extract_features(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    deterministic_fake: bool = True,
) -> DataFrame:
    """Decode + featurize via Arrow-batched mapInPandas.

    The feature vector here is a deterministic fake (byte histogram
    over 8 buckets, normalized); a real model embeds per batch in the
    same loop — the plumbing (batch iteration, schema, memory shape)
    is exactly what production uses.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                hdr = decode_header(raw)
                if hdr and hdr.get("width") is not None:
                    # real container: its own header dimensions
                    meta = {
                        "width": hdr["width"],
                        "height": hdr["height"],
                        "n_bytes": len(raw),
                    }
                else:
                    meta = _decode_stub(raw, deterministic_fake)
                hist = [0.0] * 8
                for by in raw[:4096]:
                    hist[by >> 5] += 1.0
                total = sum(hist) or 1.0
                out.append(
                    {
                        "id": int(rid),
                        "n_bytes": meta["n_bytes"],
                        "width": meta["width"],
                        "height": meta["height"],
                        "feat": [round(h / total, 6) for h in hist],
                    }
                )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(fn, FEATURE_SCHEMA)


FRAME_SCHEMA = "id bigint, frame_idx int, frame_bytes bigint"


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    id_col: str = "id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing: 1->N rows per payload via mapInPandas
    (a video decoder would emit real frames; the stub emits byte-range
    "frames" deterministically)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                n = min(max_frames, max(1, len(raw) // every_n_bytes))
                for i in range(n):
                    chunk = raw[i * every_n_bytes : (i + 1) * every_n_bytes]
                    out.append(
                        {"id": int(rid), "frame_idx": i, "frame_bytes": len(chunk)}
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(fn, FRAME_SCHEMA)
