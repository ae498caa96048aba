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
