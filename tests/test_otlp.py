"""in_opentelemetry OTLP/JSON logs decoding."""

from __future__ import annotations

import json

from fluent_bit_spark.sources.otlp import (
    parse_otlp_logs,
    parse_otlp_logs_df,
    unwrap_any_value,
)


def _req(records):
    return {"resourceLogs": [{"scopeLogs": [{"logRecords": records}]}]}


def test_any_value_unwrap():
    assert unwrap_any_value({"stringValue": "x"}) == "x"
    assert unwrap_any_value({"boolValue": True}) is True
    assert unwrap_any_value({"intValue": "42"}) == 42  # digit-string
    assert unwrap_any_value({"int_value": 7}) == 7  # snake_case too
    assert unwrap_any_value({"doubleValue": 2.5}) == 2.5
    assert unwrap_any_value(
        {"arrayValue": {"values": [{"intValue": 1}, {"stringValue": "a"}]}}
    ) == [1, "a"]
    assert unwrap_any_value(
        {"kvlistValue": {"values": [
            {"key": "k", "value": {"stringValue": "v"}}]}}
    ) == {"k": "v"}
    # non-wrapper maps pass through with converted members
    assert unwrap_any_value({"a": {"intValue": "3"}, "b": 1}) == \
        {"a": 3, "b": 1}


def test_log_record_fields():
    rows = parse_otlp_logs(_req([{
        "timeUnixNano": "1700000000000000005",
        "observedTimeUnixNano": "1700000000000000009",
        "severityNumber": 9,
        "severityText": "Info",
        "traceId": "0102",
        "spanId": "aa",
        "attributes": [
            {"key": "svc", "value": {"stringValue": "web"}},
            {"key": "n", "value": {"intValue": "3"}},
        ],
        "body": {"kvlistValue": {"values": [
            {"key": "msg", "value": {"stringValue": "boot"}}]}},
    }]))
    assert len(rows) == 1
    t, meta, rec = rows[0]
    assert t == 1700000000000000005  # timeUnixNano wins
    otlp = meta["otlp"]
    assert otlp["observed_timestamp"] == 1700000000000000009
    assert otlp["severity_number"] == 9 and otlp["severity_text"] == "Info"
    assert otlp["attributes"] == {"svc": "web", "n": 3}
    assert otlp["trace_id"] == "0102" and otlp["span_id"] == "aa"
    # kvlist body IS the record map
    assert rec == {"msg": "boot"}


def test_body_key_and_fallbacks():
    # string body lands under 'log' by default
    rows = parse_otlp_logs(_req([{"body": {"stringValue": "line"}}]))
    t, meta, rec = rows[0]
    assert t is None  # no time fields -> arrival time upstream
    assert rec == {"log": "line"}
    # custom logs_body_key nests even kvlist bodies
    rows = parse_otlp_logs(
        _req([{"body": {"kvlistValue": {"values": [
            {"key": "a", "value": {"intValue": 1}}]}}}]),
        logs_body_key="payload")
    assert rows[0][2] == {"payload": {"a": 1}}
    # observedTime fallback for the event time
    rows = parse_otlp_logs(_req([{"observed_time_unix_nano": 123}]))
    assert rows[0][0] == 123


def test_snake_case_envelope():
    rows = parse_otlp_logs({"resource_logs": [{"scope_logs": [
        {"log_records": [{"time_unix_nano": 5,
                          "body": {"string_value": "x"}}]}]}]})
    assert rows == [(5, {"otlp": {}}, {"log": "x"})]


def test_parse_otlp_logs_df(spark):
    body = json.dumps(_req([
        {"timeUnixNano": str(1000 + i), "severityNumber": i,
         "body": {"kvlistValue": {"values": [
             {"key": "i", "value": {"intValue": str(i)}}]}}}
        for i in range(3)
    ]))
    df = spark.createDataFrame([(body,), ("not json",)], ["body"])
    out = parse_otlp_logs_df(df).orderBy("time_unix_nano").collect()
    assert len(out) == 3
    assert out[2]["time_unix_nano"] == 1002
    assert json.loads(out[2]["record"]) == {"i": 2}
    assert json.loads(out[2]["metadata"])["otlp"]["severity_number"] == 2
