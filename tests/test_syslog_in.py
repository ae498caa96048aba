"""in_syslog framing + parse vs syslog_prot.c semantics."""

from __future__ import annotations

from pyspark.sql import functions as F


RFC5424 = ("<34>1 2023-10-11T22:14:15.003Z host1 app 1234 ID47 "
           "- BOM'su root' failed")
RFC3164_LOCAL = (
    "<13>Oct 11 22:14:15 su: 'su root' failed for user on /dev/pts/8"
)


def test_udp_rfc5424_parse(spark):
    from fluent_bit_spark.sources.syslog_in import parse_syslog

    df = spark.createDataFrame(
        [(RFC5424,), ("complete garbage \x01\x02",)], ["line"])
    out = parse_syslog(df, mode="udp").collect()
    # unparseable datagram dropped with a warning (prot.c:256)
    assert len(out) == 1
    r = out[0]
    assert r["pri"] == "34" and r["host"] == "host1" and r["ident"] == "app"
    assert r["pid"] == "1234" and r["msgid"] == "ID47"
    assert r["message"] == "BOM'su root' failed"
    assert r["event_time"] is not None


def test_tcp_stream_framing(spark):
    from fluent_bit_spark.sources.syslog_in import parse_syslog

    # one TCP chunk: two frames split on \n and \0, plus empty frames
    chunk = RFC5424 + "\n\n" + RFC5424.replace("host1", "host2") + "\x00"
    df = spark.createDataFrame([(chunk,)], ["line"])
    out = parse_syslog(df, mode="tcp").orderBy("host").collect()
    assert [r["host"] for r in out] == ["host1", "host2"]


def test_unix_mode_default_parser_and_keys(spark):
    from fluent_bit_spark.sources.syslog_in import parse_syslog

    df = spark.createDataFrame(
        [(RFC3164_LOCAL, "10.0.0.9")], ["line", "peer"])
    out = parse_syslog(
        df, mode="unix_udp",
        raw_message_key="raw", source_address_key="src",
        source_address_col="peer",
        default_time=F.lit("2023-10-11 00:00:00").cast("timestamp"),
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["ident"] == "su"
    assert r["message"] == "'su root' failed for user on /dev/pts/8"
    assert r["raw"] == RFC3164_LOCAL  # raw_message_key expansion
    assert r["src"] == "10.0.0.9"  # source_address_key expansion
    # rfc3164 has no year: missing-year rule anchors to the ref year


def test_explicit_parser_name(spark):
    from fluent_bit_spark.sources.syslog_in import parse_syslog

    df = spark.createDataFrame([(RFC3164_LOCAL,)], ["line"])
    out = parse_syslog(df, mode="udp", parser="syslog-rfc3164-local")
    assert out.count() == 1
    # and an unknown parser errors like "[in_syslog] parser not set"
    import pytest

    with pytest.raises(ValueError, match="parser not set"):
        parse_syslog(df, parser="nope")
