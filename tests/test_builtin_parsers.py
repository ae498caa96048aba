"""Built-in stock parser pack (reference conf/parsers.conf +
parsers_extra.conf shipped as fluent_bit_spark.parsers.builtin)."""

from __future__ import annotations

from fluent_bit_spark.parsers import apply_parser
from fluent_bit_spark.parsers.builtin import (
    BUILTIN,
    builtin_parsers,
    merge_builtin_parsers,
)


def test_all_builtins_compile():
    ps = builtin_parsers()
    assert len(ps) == len(BUILTIN) == 28
    core = {
        "apache", "apache2", "apache_error", "nginx", "k8s-nginx-ingress",
        "json", "logfmt", "docker", "docker-daemon", "syslog-rfc5424",
        "syslog-rfc3164-local", "syslog-rfc3164", "mongodb", "envoy",
        "istio-envoy-proxy", "cri", "kube-custom", "kmsg-netfilter-log",
    }
    assert core <= set(ps)


def test_builtin_parse_samples(spark):
    ps = builtin_parsers()
    df = spark.createDataFrame(
        [("1.2.3.4 - frank [10/Oct/2000:13:55:36 -0700] "
          '"GET /apache_pb.gif HTTP/1.0" 200 2326',)],
        ["text"],
    )
    row = apply_parser(df, "text", ps["apache"]).first()
    assert row["host"] == "1.2.3.4" and row["code"] == "200"
    assert str(row["event_time"]).startswith("2000-10-10 20:55:36")

    cri = spark.createDataFrame(
        [("2019-05-07T18:57:50.904275087+00:00 stdout F log content",)],
        ["text"],
    )
    r = apply_parser(cri, "text", ps["cri"]).first()
    assert r["stream"] == "stdout" and r["message"] == "log content"

    mongo = spark.createDataFrame(
        [("2017-08-22T15:45:04.034+0000 I COMMAND  [conn4] command "
          "test.zips command: count { count: \"zips\" } 10ms",)],
        ["text"],
    )
    m = apply_parser(mongo, "text", ps["mongodb"]).first()
    assert m["severity"] == "I" and m["component"] == "COMMAND"


def test_merge_builtin_user_wins():
    ps = builtin_parsers()
    user = {"apache": ps["nginx"]}
    merged = merge_builtin_parsers(user)
    assert merged["apache"] is ps["nginx"]
    assert merged["cri"] is ps["cri"]


def test_classic_resolves_builtin_parser_by_name(spark):
    from fluent_bit_spark.classic import build_classic_pipeline

    conf = """
[INPUT]
    Name    dummy
    Tag     web
    Dummy   {"log":"9.9.9.9 - u [10/Oct/2000:13:55:36 -0700] \\"GET /x HTTP/1.0\\" 404 12"}
    Samples 1

[FILTER]
    Name     parser
    Match    web
    Key_Name log
    Parser   apache
"""
    pipe = build_classic_pipeline(spark, conf)
    row = pipe.records.first()
    assert row["host"] == "9.9.9.9" and row["code"] == "404"
