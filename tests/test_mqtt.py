"""in_mqtt control-packet decode vs mqtt_prot.c semantics."""

from __future__ import annotations

import json

from fluent_bit_spark.sources.mqtt import (
    decode_mqtt_buffer,
    decode_mqtt_streams,
    encode_connect,
    encode_publish,
)


def test_connect_then_publish():
    buf = encode_connect() + encode_publish("a/b", b'{"t":21.5,"h":3}')
    out = decode_mqtt_buffer(buf)
    assert len(out) == 1
    topic, rec = out[0]
    assert topic == "a/b"
    assert json.loads(rec) == {"topic": "a/b", "t": 21.5, "h": 3}


def test_connect_required_first():
    pub = encode_publish("a/b", b'{"x":1}')
    assert decode_mqtt_buffer(pub) == []  # expecting MQTT_CONNECT
    assert len(decode_mqtt_buffer(pub, require_connect=False)) == 1


def test_qos_packet_id_skipped():
    buf = encode_connect() + encode_publish(
        "q", b'{"x":1}', qos=1, packet_id=77)
    out = decode_mqtt_buffer(buf)
    assert json.loads(out[0][1]) == {"topic": "q", "x": 1}


def test_non_json_and_non_map_dropped():
    buf = (encode_connect()
           + encode_publish("t1", b"plain text")
           + encode_publish("t2", b"[1,2]")
           + encode_publish("t3", b'{"ok":true}'))
    out = decode_mqtt_buffer(buf)
    assert [t for t, _ in out] == ["t3"]


def test_payload_key_nesting():
    buf = encode_connect() + encode_publish("k", b'{"a":1}')
    _, rec = decode_mqtt_buffer(buf, payload_key="payload")[0]
    assert json.loads(rec) == {"topic": "k", "payload": {"a": 1}}


def test_multibyte_remaining_length():
    big = b'{"pad":"' + b"x" * 300 + b'"}'
    buf = encode_connect() + encode_publish("big", big)
    out = decode_mqtt_buffer(buf)
    assert len(out) == 1
    assert len(json.loads(out[0][1])["pad"]) == 300


def test_truncated_and_overflow_topic():
    pkt = encode_publish("t", b'{"x":1}')
    assert decode_mqtt_buffer(encode_connect() + pkt[:-2]) == []
    # topic length exceeding the frame drops the packet but later
    # packets in the stream still decode
    bad = bytes([0x30, 4, 0x00, 0xFF, 0x41, 0x42])  # hlen=255 > frame
    out = decode_mqtt_buffer(encode_connect() + bad + pkt)
    assert [t for t, _ in out] == ["t"]


def test_decode_streams_spark(spark):
    rows = [
        (encode_connect() + encode_publish(f"s/{i}", b'{"v":%d}' % i),)
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "data binary")
    out = {r["topic"]: json.loads(r["record"])
           for r in decode_mqtt_streams(df).collect()}
    assert len(out) == 4
    assert out["s/2"] == {"topic": "s/2", "v": 2}
