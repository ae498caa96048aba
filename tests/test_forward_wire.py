"""Fluent Forward protocol wire codec round-trips."""

from __future__ import annotations

import gzip
import json
import struct

from fluent_bit_spark.functions.forward_wire import (
    decode_forward,
    decode_forward_streams,
    encode_forward,
    encode_message,
    pack_event_time,
)
from fluent_bit_spark.wasm.mpack import Ext, packb


EVENTS = [(1_700_000_000, 250_000_000, {"m": "a", "n": 1}),
          (1_700_000_001, 0, {"m": "b"})]


def test_event_time_ext():
    e = pack_event_time(1_700_000_000, 250_000_000)
    assert e.code == 0 and len(e.data) == 8
    assert struct.unpack(">II", e.data) == (1_700_000_000, 250_000_000)
    # fixext8 on the wire (0xD7)
    assert packb(e)[0] == 0xD7


def test_forward_mode_roundtrip():
    buf = encode_forward("app.a", EVENTS, send_options=True)
    rows = decode_forward(buf)
    assert [(t, s, ns) for t, s, ns, _, _ in rows] == [
        ("app.a", 1_700_000_000, 250_000_000),
        ("app.a", 1_700_000_001, 0)]
    assert rows[0][3] == {"m": "a", "n": 1}
    assert rows[0][4]["size"] == 2  # options map


def test_time_as_integer_compat():
    buf = encode_forward("t", EVENTS, time_as_integer=True)
    rows = decode_forward(buf)
    # Fluentd <= 0.12 compat: plain int seconds, nanos dropped
    assert rows[0][1] == 1_700_000_000 and rows[0][2] == 0


def test_compressed_packed_forward():
    buf = encode_forward("gz", EVENTS, compressed=True, chunk="abc=")
    rows = decode_forward(buf)
    assert len(rows) == 2
    assert rows[0][4]["compressed"] == "gzip"
    assert rows[0][4]["chunk"] == "abc="  # chunk is the first opts key
    # the entries element really is a gzip bin blob
    from fluent_bit_spark.wasm.mpack import unpackb

    root = unpackb(buf)
    assert isinstance(root[1], bytes) and root[1][:2] == b"\x1f\x8b"
    assert gzip.decompress(root[1])


def test_message_mode():
    buf = encode_message("m.x", 1_700_000_000, 5, {"k": "v"})
    rows = decode_forward(buf)
    assert rows == [("m.x", 1_700_000_000, 5, {"k": "v"}, {})]


def test_concatenated_chunks():
    buf = (encode_forward("a", EVENTS[:1])
           + encode_message("b", 1, 0, {"x": 1})
           + encode_forward("c", EVENTS[1:], send_options=True))
    rows = decode_forward(buf)
    assert [t for t, *_ in rows] == ["a", "b", "c"]


def test_decode_streams_spark(spark):
    rows = [(encode_forward(f"s.{i}", [(100 + i, i, {"v": i})]),)
            for i in range(5)]
    df = spark.createDataFrame(rows, "data binary")
    out = {r["tag"]: r for r in decode_forward_streams(df).collect()}
    assert len(out) == 5
    assert out["s.3"]["sec"] == 103 and out["s.3"]["nsec"] == 3
    assert json.loads(out["s.3"]["record"]) == {"v": 3}


def test_hostile_chunks_skipped(spark):
    """Malformed UTF-8 / truncated msgpack must skip the chunk, not
    kill the task."""
    good = encode_forward("ok", EVENTS[:1])
    bad_utf8 = packb(["t\xff".encode("latin-1"), [[1, {"a": 1}]]])
    rows = [(good,), (good[:-3],), (bad_utf8,), (b"\xc1\xc1\xc1",)]
    df = spark.createDataFrame(rows, "data binary")
    out = decode_forward_streams(df).collect()
    tags = [r["tag"] for r in out]
    assert "ok" in tags  # the intact chunk survives
