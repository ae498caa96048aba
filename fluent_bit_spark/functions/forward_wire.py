"""Fluent Forward protocol wire codec (out_forward / in_forward).

Reference: /root/reference/plugins/out_forward/forward.c +
forward_format.c, /root/reference/plugins/in_forward/fw_prot.c.

Wire shapes (the Fluentd Forward v1 spec the reference implements):
- **Message mode** (flush_message_mode :1175): one ``[tag, time,
  record, options?]`` array per event.
- **Forward mode** (flush_forward_mode :1268): ``[tag, [[time,
  record], ...], options?]`` — one array per (tag, chunk); timestamps
  are EventTime fixext8 type 0 (4-byte BE sec + 4-byte BE nsec,
  src/flb_time.c flb_time_append_to_mpack) unless ``time_as_integer``
  (Fluentd <= 0.12 compat) packs plain ints.
- **PackedForward / CompressedPackedForward**: the entries element is
  a bin blob of concatenated ``[time, record]`` msgpack, gzip'd in the
  compressed variant (forward.c:1321-1338; in_forward sniffs the gzip
  magic).
- **options** (forward_format.c:98-150): ``chunk`` (base64 checksum,
  ack protocol), ``size`` (entry count), ``compressed`` ("gzip").

This is the protocol INSIDE the socket; the socket itself is out of
scope (SURVEY §2.1/§2.9). Encoding/decoding over captured chunks uses
the repo's self-contained msgpack codec (wasm/mpack.py).
"""

from __future__ import annotations

import gzip
import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame

from fluent_bit_spark.wasm.mpack import Ext, packb


def pack_event_time(sec: int, nsec: int = 0) -> Ext:
    return Ext(0, struct.pack(">II", sec, nsec))


def _time_of(v: Any) -> tuple[int, int]:
    if isinstance(v, Ext) and v.code == 0 and len(v.data) == 8:
        sec, nsec = struct.unpack(">II", v.data)
        return sec, nsec
    if isinstance(v, int):
        return v, 0
    if isinstance(v, float):
        sec = int(v)
        return sec, int(round((v - sec) * 1e9))
    raise ValueError(f"not a forward timestamp: {v!r}")


def encode_forward(
    tag: str,
    events: list[tuple[int, int, dict]],
    time_as_integer: bool = False,
    send_options: bool = False,
    compressed: bool = False,
    chunk: str | None = None,
) -> bytes:
    """Forward-mode chunk (CompressedPackedForward when compressed)."""
    def t(sec: int, nsec: int):
        return sec if time_as_integer else pack_event_time(sec, nsec)

    entries = [[t(s, ns), rec] for s, ns, rec in events]
    opts: dict = {}
    if chunk is not None:
        opts["chunk"] = chunk
    opts["size"] = len(events)
    if compressed:
        opts["compressed"] = "gzip"
        blob = gzip.compress(b"".join(packb(e) for e in entries),
                             mtime=0)
        body: Any = blob
        send_options = True  # compress implies send_options
    else:
        body = entries
    arr: list = [tag, body]
    if send_options:
        arr.append(opts)
    return packb(arr)


def encode_message(
    tag: str, sec: int, nsec: int, record: dict,
    time_as_integer: bool = False,
) -> bytes:
    """Message-mode event (flush_message_mode :1175)."""
    t = sec if time_as_integer else pack_event_time(sec, nsec)
    return packb([tag, t, record])


def _unpack_stream(blob: bytes) -> list:
    """Concatenated msgpack objects -> list (PackedForward blobs and
    captured sockets carry several roots back to back)."""
    from fluent_bit_spark.wasm.mpack import _Reader, _unpack

    r = _Reader(bytes(blob))
    out = []
    while r.i < len(r.b):
        out.append(_unpack(r))
    return out


def decode_forward(buf: bytes) -> list[tuple[str, int, int, dict, dict]]:
    """Captured wire bytes -> [(tag, sec, nsec, record, options)].

    Handles all four modes like in_forward's dispatcher: the second
    array element's type picks the mode — array = Forward, bin/str =
    PackedForward (gzip-sniffed), timestamp = Message.
    """
    out: list[tuple[str, int, int, dict, dict]] = []
    for root in _unpack_stream(buf):
        if not isinstance(root, list) or len(root) < 2:
            continue
        tag = root[0]
        if isinstance(tag, bytes):
            tag = tag.decode("utf-8", "replace")
        second = root[1]
        opts = root[-1] if len(root) > 2 and isinstance(root[-1], dict) \
            else {}
        if isinstance(second, list):  # Forward mode
            for entry in second:
                if isinstance(entry, list) and len(entry) == 2 \
                        and isinstance(entry[1], dict):
                    sec, nsec = _time_of(entry[0])
                    out.append((tag, sec, nsec, entry[1], opts))
        elif isinstance(second, (bytes, bytearray)):  # (C)PackedForward
            blob = bytes(second)
            if blob[:2] == b"\x1f\x8b":  # gzip magic sniff
                blob = gzip.decompress(blob)
            for entry in _unpack_stream(blob):
                if isinstance(entry, list) and len(entry) == 2 \
                        and isinstance(entry[1], dict):
                    sec, nsec = _time_of(entry[0])
                    out.append((tag, sec, nsec, entry[1], opts))
        else:  # Message mode: [tag, time, record, options?]
            if len(root) >= 3 and isinstance(root[2], dict):
                sec, nsec = _time_of(second)
                opts = root[3] if len(root) > 3 and \
                    isinstance(root[3], dict) else {}
                out.append((tag, sec, nsec, root[2], opts))
    return out


def decode_forward_streams(
    df: DataFrame, data_col: str = "data"
) -> DataFrame:
    """DataFrame of captured forward chunks -> (tag, sec, nsec,
    record-JSON) rows, Arrow-batched."""
    import json

    import pandas as pd

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tags, secs, nsecs, recs = [], [], [], []
            for buf in pdf[data_col]:
                if buf is None:
                    continue
                try:
                    decoded = decode_forward(bytes(buf))
                except (ValueError, IndexError, struct.error,
                        UnicodeDecodeError, EOFError, OSError):
                    continue  # hostile/truncated chunk: skip, not die
                for tag, sec, nsec, rec, _ in decoded:
                    tags.append(tag)
                    secs.append(sec)
                    nsecs.append(nsec)
                    recs.append(json.dumps(
                        rec, separators=(",", ":"), default=repr))
            yield pd.DataFrame({
                "tag": pd.Series(tags, dtype="object"),
                "sec": pd.Series(secs, dtype="int64"),
                "nsec": pd.Series(nsecs, dtype="int64"),
                "record": pd.Series(recs, dtype="object"),
            })

    return df.select(data_col).mapInPandas(
        walk, "tag string, sec long, nsec long, record string")
