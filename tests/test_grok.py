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


def test_grok_types_merge_substring_names(spark):
    """A field whose name is a substring of other types text must keep
    its grok typecast (the pre-fix merge did a substring test on the
    raw Types string: %{INT:ab:int} %{INT:a:int} silently dropped a's
    cast, and an explicit Types entry clobbered unrelated grok casts)."""
    from fluent_bit_spark.parsers import apply_parser, parse_parsers_conf

    specs = parse_parsers_conf(
        """
[PARSER]
    Name         sub
    Format       grok
    Grok_Pattern %{INT:ab:int} %{INT:a:int}
"""
    )
    assert specs["sub"].types == {"ab": "integer", "a": "integer"}
    r = apply_parser(
        spark.createDataFrame([("12 7",)], ["text"]), "text", specs["sub"]
    ).first()
    assert r["ab"] == 12 and r["a"] == 7

    # explicit Types wins over the grok cast for the SAME field but
    # leaves other grok casts intact
    specs = parse_parsers_conf(
        """
[PARSER]
    Name         override
    Format       grok
    Grok_Pattern %{INT:id:int} %{INT:uid:int}
    Types        uid:string
"""
    )
    assert specs["override"].types == {"id": "integer", "uid": "string"}


def test_filter_parser_applies_grok_types(spark):
    """filter_parser try-order: the winning grok spec's Types casts
    land as column types (flb_parser_typecast after flb_parser_do);
    NOTOUCH rows keep nulls in the new typed columns."""
    from fluent_bit_spark.operators.parser_filter import filter_parser
    from fluent_bit_spark.parsers import parse_parsers_conf

    specs = parse_parsers_conf(
        """
[PARSER]
    Name         j
    Format       json
    Keys         k
[PARSER]
    Name         g
    Format       grok
    Grok_Pattern code=%{INT:code:int} took=%{NUMBER:took:float}
"""
    )
    df = spark.createDataFrame(
        [(1, '{"k": "v"}'), (2, "code=200 took=1.5"), (3, "garbage")],
        ["id", "log"],
    )
    out = filter_parser(df, "log", [specs["j"], specs["g"]], reserve_data=True)
    assert dict(out.dtypes)["code"] == "bigint"
    assert dict(out.dtypes)["took"] == "double"
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["k"] == "v" and rows[1]["code"] is None
    assert rows[2]["code"] == 200 and rows[2]["took"] == 1.5
    assert rows[3]["code"] is None and rows[3]["k"] is None
