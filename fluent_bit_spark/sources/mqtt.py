"""in_mqtt: MQTT 3.1 control-packet stream decoding.

Reference: /root/reference/plugins/in_mqtt/mqtt_prot.c
mqtt_prot_parser (:253-360): each control packet is ``byte0`` (type =
``b>>4``, PUBLISH QoS = ``(b>>1)&3``) + a remaining-length varint
(7-bit groups, little-endian, max 4 bytes — ``mult > 128^3`` is a
protocol error) + the variable header/payload. The first packet on a
connection must be CONNECT (answered CONNACK), PINGREQ is answered
PINGRESP, and every other type except PUBLISH is skipped.

mqtt_handle_publish (:176-237): topic = 2-byte BE length + bytes
(length validated against the buffer — overflow drops the packet);
QoS 1/2 adds a 2-byte packet id (PUBACK/PUBREC are transport
concerns); the message is the rest of the frame and MUST parse as a
JSON MAP (mqtt_data_append :76-96 warns and drops otherwise). The
record is ``{"topic": <topic>, ...payload}`` — or with
``payload_key`` set, ``{"topic": t, <payload_key>: {payload}}``.

Spark shape: the broker socket is out of scope; the input is a
DataFrame of captured per-connection byte streams, decoded in Arrow
batches into (topic, record-JSON) rows.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame

MQTT_CONNECT = 1
MQTT_PUBLISH = 3
MQTT_PINGREQ = 12


def _remaining_length(buf: bytes, pos: int) -> tuple[int, int] | None:
    """varint decode -> (length, bytes consumed) or None on error."""
    mult, length, i = 1, 0, 0
    while True:
        if pos + i >= len(buf):
            return None
        b = buf[pos + i]
        length += (b & 127) * mult
        mult *= 128
        i += 1
        if mult > 128 * 128 * 128:
            return None  # MQTT_ERROR: malformed varint
        if (b & 128) == 0:
            return length, i


def decode_mqtt_buffer(
    buf: bytes, payload_key: str | None = None, require_connect: bool = True
) -> list[tuple[str, str]]:
    """One captured connection stream -> [(topic, record_json)].

    Mirrors the parser state machine: CONNECT required first (else the
    stream is rejected), PUBLISH payloads must be JSON maps, all other
    packet types skipped.
    """
    out: list[tuple[str, str]] = []
    pos = 0
    first = True
    n = len(buf)
    while n - pos >= 2:
        ptype = buf[pos] >> 4
        qos = (buf[pos] >> 1) & 0x03
        rl = _remaining_length(buf, pos + 1)
        if rl is None:
            break
        length, rl_bytes = rl
        frame_start = pos + 1 + rl_bytes
        frame_end = frame_start + length
        if frame_end > n:
            break  # incomplete trailing packet
        if first and require_connect and ptype != MQTT_CONNECT:
            break  # error, expecting MQTT_CONNECT
        first = False
        if ptype == MQTT_PUBLISH:
            p = frame_start
            if length >= 2:
                hlen = (buf[p] << 8) | buf[p + 1]
                p += 2
                if hlen <= frame_end - p:
                    topic = buf[p : p + hlen].decode("utf-8", "replace")
                    p += hlen
                    if qos > 0:
                        p += 2  # packet identifier
                    msg = buf[p:frame_end]
                    try:
                        payload = json.loads(msg)
                    except ValueError:
                        payload = None
                    if isinstance(payload, dict):
                        rec: dict = {"topic": topic}
                        if payload_key:
                            rec[payload_key] = payload
                        else:
                            rec.update(payload)
                        out.append(
                            (topic,
                             json.dumps(rec, separators=(",", ":"))))
                    # non-map JSON: "MQTT Packet incomplete or is not
                    # JSON" -> record dropped
                # invalid topic length -> packet dropped
        pos = frame_end
    return out


def decode_mqtt_streams(
    df: DataFrame,
    data_col: str = "data",
    payload_key: str | None = None,
) -> DataFrame:
    """DataFrame of captured connection byte streams -> (topic,
    record) rows, Arrow-batched."""
    import pandas as pd

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            topics, recs = [], []
            for buf in pdf[data_col]:
                if buf is None:
                    continue
                try:
                    decoded = decode_mqtt_buffer(
                        bytes(buf), payload_key=payload_key)
                except (ValueError, IndexError):
                    continue  # hostile/truncated stream: skip, not die
                for topic, rec in decoded:
                    topics.append(topic)
                    recs.append(rec)
            yield pd.DataFrame(
                {"topic": pd.Series(topics, dtype="object"),
                 "record": pd.Series(recs, dtype="object")})

    return df.select(data_col).mapInPandas(walk, "topic string, record string")


def encode_publish(
    topic: str, payload: bytes, qos: int = 0, packet_id: int = 0
) -> bytes:
    """Assemble a PUBLISH packet (test/fixture helper)."""
    body = len(topic).to_bytes(2, "big") + topic.encode()
    if qos > 0:
        body += packet_id.to_bytes(2, "big")
    body += payload
    head = bytes([(MQTT_PUBLISH << 4) | (qos << 1)])
    length = len(body)
    varint = b""
    while True:
        byte = length % 128
        length //= 128
        varint += bytes([byte | 128 if length > 0 else byte])
        if length == 0:
            break
    return head + varint + body


def encode_connect(client_id: str = "c1") -> bytes:
    body = (b"\x00\x04MQTT\x04\x02\x00\x3c"
            + len(client_id).to_bytes(2, "big") + client_id.encode())
    return bytes([MQTT_CONNECT << 4, len(body)]) + body
