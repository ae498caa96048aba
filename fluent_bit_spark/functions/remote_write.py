"""Prometheus remote_write wire codec (in_/out_prometheus_remote_write).

Reference: /root/reference/plugins/in_prometheus_remote_write/
prom_rw_prot.c — the HTTP body is a snappy-compressed protobuf
``prompb.WriteRequest``; Content-Encoding snappy is decompressed via
flb_snappy (:156-230, framed format with raw-block fallback in
src/flb_snappy.c) and the protobuf decoded through cmetrics
(cmt_decode_prometheus_remote_write). out_prometheus_remote_write
encodes the same via cmt_encode_prometheus_remote_write.

Wire formats implemented here from their public specs:
- **prompb** (the Prometheus protobuf schema): ``WriteRequest
  {repeated TimeSeries timeseries = 1}``, ``TimeSeries{repeated Label
  labels = 1; repeated Sample samples = 2}``, ``Label{string name =
  1; string value = 2}``, ``Sample{double value = 1; int64 timestamp
  = 2}`` — varint/64-bit/length-delimited wire types only.
- **snappy block format**: varint uncompressed length, then literal
  (tag&3==0) and copy (1/2/4-byte offset) elements. The compressor
  here emits all-literal blocks (always valid snappy; the point is
  the wire contract, not the ratio) and the decompressor handles
  every element type including overlapping copies.
- **snappy framed format** (what flb_snappy_uncompress_framed_data
  expects): ``0xff`` stream identifier "sNaPpY", ``0x00`` compressed
  / ``0x01`` uncompressed chunks, little-endian 3-byte lengths,
  masked CRC32C of the uncompressed data per chunk.

No external dependency: the sandbox ships neither snappy nor
protobuf wheels, and both formats are small enough to implement
directly (same policy as wasm/mpack.py).
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame

# --------------------------------------------------------------- varint


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[pos]
        out |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _enc_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | 0x80 if v else b)
        if not v:
            return bytes(out)


# -------------------------------------------------------------- protobuf


def _fields(buf: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = _uvarint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            v, pos = _uvarint(buf, pos)
            yield field, wt, v
        elif wt == 1:  # 64-bit
            yield field, wt, buf[pos : pos + 8]
            pos += 8
        elif wt == 2:  # length-delimited
            ln, pos = _uvarint(buf, pos)
            yield field, wt, buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit
            yield field, wt, buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def decode_write_request(buf: bytes) -> list[tuple[dict, list]]:
    """WriteRequest bytes -> [(labels dict, [(value, ts_ms)])]."""
    series = []
    for field, wt, v in _fields(buf):
        if field != 1 or wt != 2:
            continue  # metadata etc. skipped
        labels: dict = {}
        samples: list = []
        for f2, w2, v2 in _fields(v):
            if f2 == 1 and w2 == 2:  # Label
                name = value = ""
                for f3, _, v3 in _fields(v2):
                    if f3 == 1:
                        name = v3.decode("utf-8", "replace")
                    elif f3 == 2:
                        value = v3.decode("utf-8", "replace")
                labels[name] = value
            elif f2 == 2 and w2 == 2:  # Sample
                val, ts = 0.0, 0
                for f3, w3, v3 in _fields(v2):
                    if f3 == 1 and w3 == 1:
                        (val,) = struct.unpack("<d", v3)
                    elif f3 == 2 and w3 == 0:
                        ts = v3 - (1 << 64) if v3 >= 1 << 63 else v3
                samples.append((val, ts))
        series.append((labels, samples))
    return series


def _ld(field: int, payload: bytes) -> bytes:
    return _enc_uvarint(field << 3 | 2) + _enc_uvarint(len(payload)) \
        + payload


def encode_write_request(series: list[tuple[dict, list]]) -> bytes:
    """[(labels dict, [(value, ts_ms)])] -> WriteRequest bytes."""
    out = bytearray()
    for labels, samples in series:
        ts_buf = bytearray()
        for name, value in labels.items():
            lbl = _ld(1, name.encode()) + _ld(2, value.encode())
            ts_buf += _ld(1, lbl)
        for val, ts in samples:
            smp = (_enc_uvarint(1 << 3 | 1) + struct.pack("<d", val)
                   + _enc_uvarint(2 << 3 | 0)
                   + _enc_uvarint(ts & ((1 << 64) - 1)))
            ts_buf += _ld(2, smp)
        out += _ld(1, bytes(ts_buf))
    return bytes(out)


# ---------------------------------------------------------------- snappy


def snappy_decompress(buf: bytes) -> bytes:
    """Raw snappy block decode (all element types, overlapping
    copies)."""
    want, pos = _uvarint(buf, 0)
    out = bytearray()
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        t = tag & 3
        if t == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                ln = int.from_bytes(buf[pos : pos + nb], "little")
                pos += nb
            ln += 1
            out += buf[pos : pos + ln]
            pos += ln
            continue
        if t == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif t == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: bad copy offset")
        for _ in range(ln):  # overlapping copies are byte-serial
            out.append(out[-off])
    if len(out) != want:
        raise ValueError("snappy: length mismatch")
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """All-literal raw snappy block (valid per spec; ratio 1.0)."""
    out = bytearray(_enc_uvarint(len(data)))
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 65536]
        ln = len(chunk) - 1  # literal lengths are stored minus one
        if ln < 60:
            out.append(ln << 2)
        elif ln <= 0xFF:
            out.append(60 << 2)
            out.append(ln)
        else:  # chunks cap at 64 KiB, two length bytes suffice
            out.append(61 << 2)
            out += ln.to_bytes(2, "little")
        out += chunk
        pos += len(chunk)
    return bytes(out)


_CRC_TABLE = []


def _crc32c(data: bytes) -> int:
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = _crc32c(data)
    return ((c >> 15 | c << 17) + 0xA282EAD8) & 0xFFFFFFFF


def snappy_frame(data: bytes) -> bytes:
    """Wrap raw data in the framed format (one compressed chunk)."""
    body = snappy_compress(data)
    chunk = struct.pack("<I", _masked_crc(data)) + body
    return (b"\xff\x06\x00\x00sNaPpY"
            + b"\x00" + len(chunk).to_bytes(3, "little") + chunk)


def snappy_unframe(buf: bytes) -> bytes:
    """Framed-format decode (identifier, compressed/uncompressed
    chunks, CRC verified); raw-block input passes through untouched —
    the flb_snappy fallback shape."""
    if not buf.startswith(b"\xff\x06\x00\x00sNaPpY"):
        return snappy_decompress(buf)  # raw block fallback
    pos, n = 10, len(buf)
    out = bytearray()
    while pos + 4 <= n:
        ctype = buf[pos]
        ln = int.from_bytes(buf[pos + 1 : pos + 4], "little")
        chunk = buf[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if ctype == 0x00:
            crc = struct.unpack("<I", chunk[:4])[0]
            data = snappy_decompress(chunk[4:])
        elif ctype == 0x01:
            crc = struct.unpack("<I", chunk[:4])[0]
            data = chunk[4:]
        elif ctype in (0xFF,) or 0x80 <= ctype <= 0xFD:
            continue  # repeated identifier / skippable chunk
        else:
            raise ValueError(f"snappy frame: unknown chunk {ctype:#x}")
        if _masked_crc(data) != crc:
            raise ValueError("snappy frame: CRC mismatch")
        out += data
    return bytes(out)


# ----------------------------------------------------------------- spark


def decode_remote_write(
    df: DataFrame, data_col: str = "data"
) -> DataFrame:
    """Captured remote_write bodies -> (name, labels JSON, value,
    ts_ms) sample rows (the __name__ label is lifted out like the
    cmetrics decoder does)."""
    import json

    import pandas as pd

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            names, labels_out, vals, tss = [], [], [], []
            for buf in pdf[data_col]:
                if buf is None:
                    continue
                try:
                    raw = snappy_unframe(bytes(buf))
                    series = decode_write_request(raw)
                except (ValueError, IndexError, struct.error):
                    continue  # undecodable body skipped with a warn
                for labels, samples in series:
                    name = labels.pop("__name__", "")
                    lbl_json = json.dumps(
                        labels, separators=(",", ":"), sort_keys=True)
                    for val, ts in samples:
                        names.append(name)
                        labels_out.append(lbl_json)
                        vals.append(val)
                        tss.append(ts)
            yield pd.DataFrame({
                "name": pd.Series(names, dtype="object"),
                "labels": pd.Series(labels_out, dtype="object"),
                "value": pd.Series(vals, dtype="float64"),
                "ts_ms": pd.Series(tss, dtype="int64"),
            })

    return df.select(data_col).mapInPandas(
        walk, "name string, labels string, value double, ts_ms long")


def encode_remote_write_body(
    series: list[tuple[dict, list]], framed: bool = True
) -> bytes:
    """Series -> the HTTP body out_prometheus_remote_write would
    POST (snappy over prompb)."""
    raw = encode_write_request(series)
    return snappy_frame(raw) if framed else snappy_compress(raw)
