"""Grok front-end: macro expansion, recursion, types, and end-to-end
parsing through the existing regex machinery."""

from __future__ import annotations

import pytest

from fluent_bit_spark.parsers.grok import grok_parser, grok_to_regex


def test_expansion_capture_and_noncapture():
    rx, types = grok_to_regex("%{WORD:verb} %{INT:code:int} %{NOTSPACE}")
    assert rx == r"(?<verb>\b\w+\b) (?<code>[+-]?\d+) (?:\S+)"
    assert types == {"code": "integer"}


def test_recursive_patterns_expand():
    rx, _ = grok_to_regex("%{IPORHOST:host}")
    assert rx.startswith("(?<host>")
    assert "%{" not in rx  # fully expanded
    import re

    # grok emits Java/Onig-style named groups; Python re needs (?P<
    py = rx.replace("(?<", "(?P<").replace("(?P<=", "(?<=").replace(
        "(?P<!", "(?<!"
    )
    assert re.fullmatch(py, "10.1.2.3")
    assert re.fullmatch(py, "example.com")


def test_unknown_and_cycle_raise():
    with pytest.raises(ValueError, match="unknown grok"):
        grok_to_regex("%{NOPE:x}")
    with pytest.raises(ValueError, match="cycle"):
        grok_to_regex("%{A:x}", custom={"A": "%{B}", "B": "%{A}"})


def test_custom_patterns_override():
    rx, _ = grok_to_regex("%{SEV:sev}", custom={"SEV": "(?:LOW|HIGH)"})
    assert rx == "(?<sev>(?:LOW|HIGH))"


def test_grok_format_in_parsers_conf(spark):
    """Loader extension: [PARSER] Format grok + Grok_Pattern compiles
    to a regex spec (typed captures included) through the normal
    parsers-file path."""
    from fluent_bit_spark.parsers import apply_parser, parse_parsers_conf

    specs = parse_parsers_conf(
        """
[PARSER]
    Name         ev_grok
    Format       grok
    Grok_Pattern %{WORD:verb} %{INT:code:int} %{NOTSPACE:path}
"""
    )
    spec = specs["ev_grok"]
    assert spec.format == "regex" and spec.types == {"code": "integer"}
    df = spark.createDataFrame([("GET 200 /idx",)], ["text"])
    r = apply_parser(df, "text", spec).first()
    assert r["verb"] == "GET" and r["code"] == 200 and r["path"] == "/idx"


def test_grok_parser_end_to_end(spark):
    """Underscored field names exercise the to_java_regex group
    renaming; the apache-ish line exercises composite patterns."""
    from fluent_bit_spark.parsers import apply_parser

    spec = grok_parser(
        "apache_grok",
        '%{IPORHOST:client_ip} %{USER:ident} %{USER:auth} '
        r'\[%{HTTPDATE:ts}\] "%{WORD:verb} %{NOTSPACE:path} HTTP/%{NUMBER:httpver:float}" '
        "%{INT:status:int} %{INT:bytes_sent:int}",
    )
    df = spark.createDataFrame(
        [
            (
                '10.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
                '"GET /apache_pb.gif HTTP/1.0" 200 2326',
            ),
            ("not a log line",),
        ],
        ["text"],
    )
    rows = apply_parser(df, "text", spec).collect()
    ok = [r for r in rows if r["_parse_ok"]]
    assert len(ok) == 1
    r = ok[0]
    assert r["client_ip"] == "10.0.0.1" and r["auth"] == "frank"
    assert r["verb"] == "GET" and r["path"] == "/apache_pb.gif"
    assert r["status"] == 200 and r["bytes_sent"] == 2326  # typed int
    assert r["httpver"] == 1.0  # typed float
    bad = [r for r in rows if not r["_parse_ok"]]
    assert len(bad) == 1 and bad[0]["client_ip"] is None
