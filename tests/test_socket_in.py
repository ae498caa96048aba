"""in_tcp/in_udp/in_unix_socket/in_serial payload framing."""

from __future__ import annotations

import json

from fluent_bit_spark.sources.socket_in import (
    parse_json_stream,
    parse_separated,
)


def test_separator_framing(spark):
    df = spark.createDataFrame(
        [("a\nb\n\nc\npartial-tail",)], ["data"])
    out = [r["log"] for r in parse_separated(df).collect()]
    # empty chunks kept (only syslog skips empties); tail buffered
    assert out == ["a", "b", "", "c"]


def test_custom_separator_and_key(spark):
    df = spark.createDataFrame([("x||y||",)], ["data"])
    out = [r["msg"] for r in parse_separated(
        df, separator="||", key="msg").collect()]
    assert out == ["x", "y"]


def test_json_stream_map_and_other_roots(spark):
    df = spark.createDataFrame(
        [('{"a":1} [1,2] "s" {"b":2}',), ("{bad json",)], ["data"])
    out = [json.loads(r["record"])
           for r in parse_json_stream(df).collect()]
    # invalid JSON payload skipped wholesale (tcp_conn.c:161-166)
    assert len(out) == 4
    assert {"a": 1} in out and {"b": 2} in out
    assert {"msg": [1, 2]} in out and {"msg": "s"} in out


def test_json_stream_source_address(spark):
    df = spark.createDataFrame(
        [('{"a":1}', "10.1.1.1")], "data string, peer string")
    out = parse_json_stream(
        df, source_address_col="peer",
        source_address_key="remote").collect()
    assert json.loads(out[0]["record"]) == {"a": 1, "remote": "10.1.1.1"}
