"""filter_parser semantics (plugins/filter_parser/filter_parser.c):
try parsers in order, Reserve_Data / Preserve_Key merge, parser time
replaces record time, NOTOUCH on total parse failure."""

import datetime

import pytest

from fluent_bit_spark.operators.parser_filter import filter_parser
from fluent_bit_spark.parsers.config import parse_parsers_conf

T0 = datetime.datetime(2026, 1, 1)

CONF = """
[PARSER]
    Name j
    Format json

[PARSER]
    Name lf
    Format regex
    Regex ^level=(?<level>\\S+) msg=(?<msg>\\S+)$

[PARSER]
    Name timed
    Format regex
    Regex ^(?<t>\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}) (?<body>.*)$
    Time_Key t
    Time_Format %Y-%m-%d %H:%M:%S
"""


@pytest.fixture(scope="module")
def specs():
    return parse_parsers_conf(CONF)


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        ("a", T0, "host1", "level=info msg=ok"),
        ("a", T0, "host2", '{"level":"warn","code":"7"}'),
        ("a", T0, "host3", "garbage ==="),
    ]
    return spark.createDataFrame(
        rows, "tag string, event_time timestamp, host string, log string"
    )


def test_try_in_order_with_fallback(logs, specs):
    out = filter_parser(
        logs, "log", [specs["j"], specs["lf"]], reserve_data=True
    )
    rows = {r["host"]: r for r in out.collect()}
    assert rows["host1"]["level"] == "info" and rows["host1"]["msg"] == "ok"
    assert rows["host2"]["level"] == "warn" and rows["host2"]["code"] == "7"
    # NOTOUCH: failed rows keep the record untouched
    assert rows["host3"]["level"] is None
    assert rows["host3"]["log"] == "garbage ==="
    # source key dropped on success (Preserve_Key off)
    assert rows["host1"]["log"] is None


def test_reserve_data_off_drops_originals(logs, specs):
    out = filter_parser(logs, "log", [specs["j"], specs["lf"]])
    ok = [r for r in out.collect() if r["msg"] == "ok"][0]
    assert ok["host"] is None  # original fields dropped
    fail = [r for r in out.collect() if r["log"] == "garbage ==="][0]
    assert fail["host"] == "host3"  # untouched row keeps everything


def test_preserve_key(logs, specs):
    out = filter_parser(
        logs, "log", [specs["lf"]], reserve_data=True, preserve_key=True
    )
    ok = [r for r in out.collect() if r["level"] == "info"][0]
    assert ok["log"] == "level=info msg=ok"


def test_parser_time_replaces_record_time(spark, specs):
    df = spark.createDataFrame(
        [("a", T0, "2027-03-04 05:06:07 hello")],
        "tag string, event_time timestamp, log string",
    )
    out = filter_parser(df, "log", [specs["timed"]], reserve_data=True)
    r = out.first()
    assert r["event_time"] == datetime.datetime(2027, 3, 4, 5, 6, 7)
    assert r["body"] == "hello"
    assert r["t"] is None  # Time_Keep off strips the time key


def test_classic_conf_parser_filter(spark, specs):
    from fluent_bit_spark.classic import build_classic_pipeline

    df = spark.createDataFrame(
        [(T0, "level=x msg=y")], "event_time timestamp, log string"
    )
    conf = """
[INPUT]
    Name lib
    Tag  raw.in

[FILTER]
    Name         parser
    Match        raw.*
    Key_Name     log
    Parser       j
    Parser       lf
    Reserve_Data On
"""
    pipe = build_classic_pipeline(
        spark, conf, parsers=specs, lib_inputs={"raw.in": df}
    )
    r = pipe.records.first()
    assert r["level"] == "x" and r["msg"] == "y"
