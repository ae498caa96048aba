"""Prometheus remote_write codec: prompb protobuf + snappy block/
framed formats, round-trips and spec edge cases."""

from __future__ import annotations

import json
import struct

import pytest

from fluent_bit_spark.functions.remote_write import (
    decode_remote_write,
    decode_write_request,
    encode_remote_write_body,
    encode_write_request,
    snappy_compress,
    snappy_decompress,
    snappy_frame,
    snappy_unframe,
)

SERIES = [
    ({"__name__": "http_requests_total", "job": "api", "code": "200"},
     [(1027.0, 1700000000123), (1028.5, 1700000001123)]),
    ({"__name__": "up", "job": "api"}, [(1.0, 1700000000123)]),
]


def test_write_request_roundtrip():
    buf = encode_write_request(SERIES)
    assert decode_write_request(buf) == SERIES


def test_negative_timestamp_and_special_values():
    s = [({"__name__": "m"}, [(float("inf"), -5)])]
    out = decode_write_request(encode_write_request(s))
    assert out[0][1][0] == (float("inf"), -5)


def test_snappy_literal_roundtrip():
    for data in (b"", b"x", b"hello world" * 10, bytes(range(256)) * 300):
        assert snappy_decompress(snappy_compress(data)) == data


def test_snappy_copy_elements():
    # hand-built block: literal "abcd" + 1-byte-offset copy len 8
    # off 4 -> overlapping copy repeats "abcd" twice
    block = bytes([12]) + bytes([3 << 2]) + b"abcd" \
        + bytes([((8 - 4) << 2) | 1, 4])
    assert snappy_decompress(block) == b"abcdabcdabcd"
    # 2-byte-offset copy
    block = bytes([8]) + bytes([3 << 2]) + b"abcd" \
        + bytes([(3 << 2) | 2]) + (4).to_bytes(2, "little")
    assert snappy_decompress(block) == b"abcdabcd"
    with pytest.raises(ValueError):
        snappy_decompress(bytes([4]) + bytes([(3 << 2) | 1, 9]))


def test_snappy_framed_roundtrip_and_crc():
    data = b"framed payload " * 100
    framed = snappy_frame(data)
    assert framed.startswith(b"\xff\x06\x00\x00sNaPpY")
    assert snappy_unframe(framed) == data
    # CRC corruption detected (flip a byte inside the chunk DATA)
    bad = bytearray(framed)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        snappy_unframe(bytes(bad))
    # raw-block bodies pass through the flb fallback path
    assert snappy_unframe(snappy_compress(data)) == data


def test_decode_remote_write_spark(spark):
    rows = [(encode_remote_write_body(SERIES),),
            (encode_remote_write_body(SERIES, framed=False),),
            (b"garbage",)]
    df = spark.createDataFrame(rows, "data binary")
    out = decode_remote_write(df).collect()
    assert len(out) == 6  # 3 samples x 2 decodable bodies
    r = sorted(out, key=lambda r: (r["name"], r["ts_ms"]))[0]
    assert r["name"] == "http_requests_total"
    assert json.loads(r["labels"]) == {"job": "api", "code": "200"}
    assert r["value"] == 1027.0 and r["ts_ms"] == 1700000000123


def test_known_crc32c_vector():
    from fluent_bit_spark.functions.remote_write import _crc32c

    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
    assert _crc32c(bytes(32)) == 0x8A9136AA


def test_truncated_bodies_are_skipped(spark):
    """Truncated/hostile bytes must skip the body, never kill the
    task (the reference logs and drops)."""
    good = encode_remote_write_body(SERIES[:1])
    rows = [(good[: i * 7],) for i in range(1, 10)] + [(good,)]
    df = spark.createDataFrame(rows, "data binary")
    out = decode_remote_write(df).collect()
    assert len(out) >= 2  # the intact body's samples survive
