"""Multiline join tests: regex rule mode (java stacktrace), CRI and
docker partial-line modes."""

from __future__ import annotations

import pytest

from fluent_bit_spark.operators.multiline import cri_join, docker_join, multiline_join

JAVA_START = r"^\d{4}-\d\d-\d\d|^[A-Z][a-z]+Exception|^Exception"


@pytest.fixture(scope="module")
def javalog(spark):
    lines = [
        "2026-01-01 10:00:00 INFO starting",
        "2026-01-01 10:00:01 ERROR failure",
        "ExceptionInInitializerError: boom",
        "    at com.example.Main.run(Main.java:12)",
        "    at com.example.Main.main(Main.java:5)",
        "2026-01-01 10:00:02 INFO recovered",
    ]
    return spark.createDataFrame(
        [("f1", i, l) for i, l in enumerate(lines)], "file string, seq long, line string"
    )


def test_multiline_regex_rule(javalog):
    out = {
        r["first_seq"]: (r["record"], r["n_lines"])
        for r in multiline_join(javalog, ["file"], "seq", "line", JAVA_START).collect()
    }
    assert out[0] == ("2026-01-01 10:00:00 INFO starting", 1)
    assert out[1][1] == 1
    rec = out[2][0]
    assert rec.startswith("ExceptionInInitializerError")
    assert rec.count("\n") == 2  # 3 joined lines
    assert out[5] == ("2026-01-01 10:00:02 INFO recovered", 1)


def test_cri_partial_lines(spark):
    lines = [
        "2026-01-01T00:00:00.0Z stdout P part-one-",
        "2026-01-01T00:00:00.1Z stdout P part-two-",
        "2026-01-01T00:00:00.2Z stdout F end",
        "2026-01-01T00:00:00.3Z stderr F whole-line",
    ]
    df = spark.createDataFrame(
        [("c1", i, l) for i, l in enumerate(lines)], "pod string, seq long, line string"
    )
    out = {r["log"]: r for r in cri_join(df, ["pod"], "seq", "line").collect()}
    assert "part-one-part-two-end" in out
    assert out["part-one-part-two-end"]["n_lines"] == 3
    assert out["part-one-part-two-end"]["stream"] == "stdout"
    assert out["whole-line"]["stream"] == "stderr"


def test_docker_partial_lines(spark):
    lines = [
        '{"log": "hello ", "stream": "stdout"}',
        '{"log": "world\\n", "stream": "stdout"}',
        '{"log": "single\\n", "stream": "stdout"}',
    ]
    df = spark.createDataFrame(
        [("c1", i, l) for i, l in enumerate(lines)], "pod string, seq long, line string"
    )
    out = {r["log"] for r in docker_join(df, ["pod"], "seq", "line").collect()}
    assert out == {"hello world", "single"}
