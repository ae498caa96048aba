"""in_opentelemetry OTLP/JSON traces decode vs the reference walk
(plugins/in_opentelemetry/opentelemetry_traces.c)."""

import json

import pytest

from fluent_bit_spark.sources.otlp_traces import (
    _Reject,
    parse_otlp_traces,
    parse_otlp_traces_df,
    parse_raw_traces_df,
)

TID = "0af7651916cd43dd8448eb211c80319c"
SID = "b7ad6b7169203331"
PID = "00f067aa0ba902b7"


def payload(spans, scope=None, resource=None, rs_extra=None):
    rs = {
        "resource": resource if resource is not None else {
            "attributes": [
                {"key": "host", "value": {"stringValue": "web-1"}}],
        },
        "scopeSpans": [{
            "scope": scope if scope is not None else
            {"name": "lib", "version": "1.2"},
            "spans": spans,
        }],
    }
    if rs_extra:
        rs.update(rs_extra)
    return {"resourceSpans": [rs]}


def span(**kw):
    s = {
        "name": "op", "traceId": TID, "spanId": SID,
        "startTimeUnixNano": "1700000000000000000",
        "endTimeUnixNano": "1700000001000000000",
        "kind": 2,
        "status": {"code": "OK"},
    }
    s.update(kw)
    return s


class TestTraceWalk:
    def test_basic_span_fields(self):
        rows = parse_otlp_traces(payload([span()]))
        assert len(rows) == 1
        r = rows[0]
        assert r["trace_id"] == TID and r["span_id"] == SID
        assert r["name"] == "op" and r["kind"] == 2
        assert r["start_time_unix_nano"] == 1700000000000000000
        assert r["end_time_unix_nano"] == 1700000001000000000
        assert r["status_code"] == 1 and r["status_message"] is None
        assert r["resource_attributes"] == {"host": "web-1"}
        assert r["scope_name"] == "lib" and r["scope_version"] == "1.2"

    def test_uppercase_hex_normalized(self):
        rows = parse_otlp_traces(payload([span(traceId=TID.upper())]))
        assert rows[0]["trace_id"] == TID  # bytes → lowercase hex

    def test_partial_hex_zero_fill(self):
        # hex_to_id's return is ignored after memset: pairs decode
        # until the first invalid pair, rest stays zero
        bad = "abzz" + "0" * 28
        rows = parse_otlp_traces(payload([span(traceId=bad)]))
        assert rows[0]["trace_id"] == "ab" + "00" * 15

    def test_wrong_trace_id_length_aborts_remaining_spans(self):
        rows = parse_otlp_traces(payload([
            span(name="a"), span(name="b", traceId="abcd"),
            span(name="c")]))
        assert [r["name"] for r in rows] == ["a"]

    def test_missing_name_aborts_remaining_spans(self):
        s = span()
        del s["name"]
        rows = parse_otlp_traces(payload([span(name="a"), s, span()]))
        assert [r["name"] for r in rows] == ["a"]

    def test_parent_span_id_empty_string_ignored(self):
        rows = parse_otlp_traces(payload([span(parentSpanId="")]))
        assert rows[0]["parent_span_id"] is None
        rows = parse_otlp_traces(payload([span(parentSpanId=PID)]))
        assert rows[0]["parent_span_id"] == PID

    def test_timestamps_string_only(self):
        # integer-typed start/end are IGNORED (MSGPACK_OBJECT_STR
        # check at :754) — deviation: NULL instead of arrival time
        rows = parse_otlp_traces(
            payload([span(startTimeUnixNano=1700, endTimeUnixNano=1800)]))
        assert rows[0]["start_time_unix_nano"] is None
        assert rows[0]["end_time_unix_nano"] is None

    def test_strtoull_semantics(self):
        rows = parse_otlp_traces(payload([
            span(startTimeUnixNano="  123abc",
                 endTimeUnixNano="-5")]))
        assert rows[0]["start_time_unix_nano"] == 123
        # strtoull("-5") wraps to 2^64-5; as int64 that's -5
        assert rows[0]["end_time_unix_nano"] == -5
        rows = parse_otlp_traces(payload([
            span(startTimeUnixNano="9" * 32)]))  # >31 chars → 0
        assert rows[0]["start_time_unix_nano"] == 0

    def test_kind_validation(self):
        rows = parse_otlp_traces(payload([span(kind=9)]))
        assert rows[0]["kind"] == 1  # out of range keeps INTERNAL
        rows = parse_otlp_traces(payload([span(kind=0)]))
        assert rows[0]["kind"] == 0
        s = span()
        del s["kind"]
        rows = parse_otlp_traces(payload([s]))
        assert rows[0]["kind"] == 1  # default

    def test_status_codes(self):
        for code_s, code in (("unset", 0), ("Ok", 1), ("ERROR", 2)):
            rows = parse_otlp_traces(payload([span(
                status={"code": code_s, "message": "m"})]))
            assert rows[0]["status_code"] == code
            assert rows[0]["status_message"] == "m"
        # invalid code string → result ignored → default kept
        rows = parse_otlp_traces(payload([span(status={"code": "BAD"})]))
        assert rows[0]["status_code"] == 0
        # code as int → "status code is missing" path → default
        rows = parse_otlp_traces(payload([span(status={"code": 2})]))
        assert rows[0]["status_code"] == 0

    def test_attribute_type_matching(self):
        attrs = [
            {"key": "s", "value": {"stringValue": "x"}},
            {"key": "i", "value": {"intValue": 7}},
            {"key": "i_str", "value": {"intValue": "7"}},  # skipped!
            {"key": "d", "value": {"doubleValue": 1.5}},
            {"key": "d_int", "value": {"doubleValue": 3}},  # skipped
            {"key": "b", "value": {"boolValue": True}},
            {"key": "arr", "value": {"arrayValue": {"values": [
                {"stringValue": "q"}]}}},  # accepted-but-dropped
            {"key": "kv", "value": {"kvlistValue": {"values": []}}},
            {"key": "bytes", "value": {"bytesValue": "AA=="}},
            {"key": "plain", "value": "unwrapped"},  # not a wrapper
        ]
        rows = parse_otlp_traces(payload([span(attributes=attrs)]))
        assert rows[0]["attributes"] == {
            "s": "x", "i": 7, "d": 1.5, "b": True}

    def test_wrapper_prefix_compare_quirk(self):
        # strncasecmp compares only strlen(key) chars: any prefix of
        # the canonical wrapper name selects that type
        attrs = [{"key": "p", "value": {"str": "x"}},
                 {"key": "q", "value": {"INTV": 3}}]
        rows = parse_otlp_traces(payload([span(attributes=attrs)]))
        assert rows[0]["attributes"] == {"p": "x", "q": 3}

    def test_events_partial_abort(self):
        events = [
            {"name": "e1", "timeUnixNano": "100",
             "attributes": [{"key": "k",
                             "value": {"stringValue": "v"}}],
             "droppedAttributesCount": 2},
            {"timeUnixNano": "200"},  # no name → abort events
            {"name": "e3"},
        ]
        rows = parse_otlp_traces(payload([span(events=events),
                                          span(name="after")]))
        # span walk continues (result ignored at :791)
        assert [r["name"] for r in rows] == ["op", "after"]
        evs = rows[0]["events"]
        assert evs == [{"name": "e1", "time_unix_nano": 100,
                        "attributes": {"k": "v"},
                        "dropped_attributes_count": 2}]

    def test_event_dropped_count_case_sensitive(self):
        events = [{"name": "e", "droppedattributescount": 5}]
        rows = parse_otlp_traces(payload([span(events=events)]))
        assert "dropped_attributes_count" not in rows[0]["events"][0]

    def test_links(self):
        links = [
            {"traceId": TID.upper(), "spanId": SID,
             "traceState": "x=1", "flags": 3,
             "droppedAttributesCount": 1,
             "attributes": [{"key": "a",
                             "value": {"boolValue": False}}]},
            {"spanId": SID},  # missing traceId → abort links
            {"traceId": TID, "spanId": SID},
        ]
        rows = parse_otlp_traces(payload([span(links=links)]))
        assert rows[0]["links"] == [{
            "trace_id": TID, "span_id": SID, "trace_state": "x=1",
            "attributes": {"a": False},
            "dropped_attributes_count": 1, "flags": 3}]

    def test_link_case_sensitive_optionals(self):
        links = [{"traceId": TID, "spanId": SID, "tracestate": "x"}]
        rows = parse_otlp_traces(payload([span(links=links)]))
        assert "trace_state" not in rows[0]["links"][0]

    def test_dropped_counts(self):
        rows = parse_otlp_traces(payload([span(
            droppedAttributesCount=1, droppedEventsCount=2,
            droppedLinksCount=3)]))
        r = rows[0]
        assert (r["dropped_attributes_count"],
                r["dropped_events_count"],
                r["dropped_links_count"]) == (1, 2, 3)

    def test_root_fallbacks_and_rejects(self):
        good = payload([span()])
        snake = {"resource_spans": good["resourceSpans"]}
        assert len(parse_otlp_traces(snake)) == 1
        anycase = {"RESOURCESPANS": good["resourceSpans"]}
        assert len(parse_otlp_traces(anycase)) == 1
        with pytest.raises(_Reject):
            parse_otlp_traces({"nope": []})
        with pytest.raises(_Reject):
            parse_otlp_traces({"resourceSpans": {}})  # not array

    def test_scope_spans_camel_only(self):
        # scopeSpans has NO snake_case fallback (:993) — the payload
        # is rejected outright
        p = {"resourceSpans": [{
            "resource": {},
            "scope_spans": [{"scope": {}, "spans": [span()]}]}]}
        with pytest.raises(_Reject):
            parse_otlp_traces(p)

    def test_missing_resource_rejects_whole_payload(self):
        p = {"resourceSpans": [
            payload([span()])["resourceSpans"][0],
            {"scopeSpans": []},  # resource missing → ctr_destroy
        ]}
        with pytest.raises(_Reject):
            parse_otlp_traces(p)

    def test_resource_schema_url_read_from_resource_map(self):
        p = payload([span()],
                    resource={"attributes": [],
                              "schemaUrl": "https://s/1"},
                    rs_extra={"schemaUrl": "https://ignored"})
        rows = parse_otlp_traces(p)
        assert rows[0]["resource_schema_url"] == "https://s/1"

    def test_scope_schema_url_and_scope_attrs(self):
        p = {"resourceSpans": [{
            "resource": {},
            "scopeSpans": [{
                "scope": {"name": "n", "attributes": [
                    {"key": "sa", "value": {"doubleValue": 2.5}}],
                    "droppedAttributesCount": 4},
                "schemaUrl": "https://sc",
                "spans": [span()]}]}]}
        r = parse_otlp_traces(p)[0]
        assert r["scope_schema_url"] == "https://sc"
        assert r["scope_attributes"] == {"sa": 2.5}
        assert r["scope_dropped_attributes_count"] == 4

    def test_values_unwrap_rules(self):
        # arrayValue/kvlistValue inner {"values": [...]} unwrap; a
        # single-key inner map that is NOT 'values' fails (-3)
        attrs = [{"key": "bad", "value": {"arrayValue": {"nope": []}}}]
        rows = parse_otlp_traces(payload([span(attributes=attrs)]))
        assert rows[0]["attributes"] == {}


@pytest.mark.usefixtures("spark")
class TestTraceDataFrames:
    def test_df_decode(self, spark):
        bodies = [
            json.dumps(payload([span(), span(name="op2", kind=5)])),
            "not json",
            json.dumps({"resourceSpans": "bad"}),
        ]
        df = spark.createDataFrame([(b,) for b in bodies], "body string")
        out = parse_otlp_traces_df(df)
        rows = {r["name"]: r for r in out.collect()}
        assert set(rows) == {"op", "op2"}
        assert rows["op2"]["kind"] == 5
        assert json.loads(rows["op"]["resource_attributes"]) == {
            "host": "web-1"}
        assert json.loads(rows["op"]["events"]) == []

    def test_raw_traces_mode(self, spark):
        bodies = [json.dumps({"a": 1}), "plain text", "[1,2]"]
        df = spark.createDataFrame([(b,) for b in bodies], "body string")
        recs = [r["record"]
                for r in parse_raw_traces_df(df).collect()]
        assert json.loads(recs[0]) == {"a": 1}
        assert json.loads(recs[1]) == {"trace": "plain text"}
        assert json.loads(recs[2]) == {"trace": "[1,2]"}
