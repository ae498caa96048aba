"""in_elasticsearch Bulk + in_splunk HEC request-body parsing."""

from __future__ import annotations

import json

from fluent_bit_spark.sources.api_in import (
    hec_json_records,
    parse_es_bulk,
    parse_hec_json,
    parse_hec_raw,
    process_bulk,
)


BULK = "\n".join([
    '{"index":{"_index":"i1","_id":"1"}}',
    '{"msg":"a","svc":"web"}',
    '{"create":{"_index":"i1"}}',
    '{"msg":"b","svc":"db"}',
    '{"delete":{"_index":"i1","_id":"9"}}',
    '{"update":{"_id":"1"}}',
    '{"doc":{"msg":"nope"}}',
    '{"index":{}}',
    '{"msg":"c","svc":"web"}',
])


def test_bulk_ops_and_statuses():
    records, statuses = process_bulk(BULK)
    assert len(records) == 3  # index/create/index; update+delete skipped
    recs = [json.loads(r) for _, r in records]
    assert recs[0]["@meta"] == {"index": {"_index": "i1", "_id": "1"}}
    assert recs[0]["msg"] == "a"
    assert recs[1]["@meta"] == {"create": {"_index": "i1"}}
    sts = json.loads(statuses)
    assert sts == [
        {"index": {"status": 201, "result": "created"}},
        {"create": {"status": 201, "result": "created"}},
        {"delete": {"status": 404, "result": "not_found"}},
        {"update": {"status": 403, "result": "forbidden"}},
        {"index": {"status": 201, "result": "created"}},
    ]


def test_bulk_unknown_op_stops():
    body = "\n".join([
        '{"upsert":{}}', '{"msg":"x"}',
        '{"index":{}}', '{"msg":"y"}',
    ])
    records, statuses = process_bulk(body)
    assert records == []  # unknown op abandons the rest
    assert json.loads(statuses) == [
        {"unknown": {"status": 400, "result": "bad_request"}}]
    # a non-op FIRST key is an unknown op (get_write_op takes key[0])
    records, statuses = process_bulk('{"msg":"no meta"}\n{"index":{}}')
    assert records == []
    assert json.loads(statuses) == [
        {"unknown": {"status": 400, "result": "bad_request"}}]
    # empty-map meta = "meta information line is missing" -> silent stop
    records, statuses = process_bulk('{}\n{"index":{}}')
    assert records == [] and json.loads(statuses) == []


def test_bulk_tag_key():
    records, _ = process_bulk(BULK, tag_key="svc", tag="es.0")
    assert [t for t, _ in records] == ["web", "db", "web"]


def test_parse_es_bulk_spark(spark):
    df = spark.createDataFrame([(BULK, "es.0")], "body string, tag string")
    out = parse_es_bulk(df, tag_col="tag", tag_key="svc").collect()
    assert sorted(r["tag"] for r in out) == ["db", "web", "web"]
    assert all(json.loads(r["record"])["@meta"] for r in out)


def test_hec_json_shapes():
    # single map
    assert len(hec_json_records('{"event":"a"}')) == 1
    # concatenated maps
    recs = hec_json_records('{"event":"a"} {"event":"b"}')
    assert [json.loads(r)["event"] for _, r in recs] == ["a", "b"]
    # array of maps
    recs = hec_json_records('[{"event":"a"},{"event":"b"}]')
    assert len(recs) == 2
    # invalid type rejected wholesale
    assert hec_json_records('"just a string"') == []
    # tag_key routing
    recs = hec_json_records('{"event":"a","src":"t9"}', tag_key="src",
                            tag="hec.0")
    assert recs[0][0] == "t9"


def test_parse_hec_json_spark(spark):
    df = spark.createDataFrame(
        [('{"event":"a"}{"event":"b"}',), ('[{"event":"c"}]',)],
        ["body"])
    out = parse_hec_json(df).collect()
    assert sorted(json.loads(r["record"])["event"] for r in out) == \
        ["a", "b", "c"]


def test_parse_hec_raw_spark(spark):
    df = spark.createDataFrame(
        [("line one\nline two", "Splunk tok123")],
        "body string, auth string")
    out = parse_hec_raw(df).collect()
    # whole body = ONE record under 'log' (splunk_prot.c:219-280)
    assert len(out) == 1 and out[0]["log"] == "line one\nline two"
    out = parse_hec_raw(df, auth_col="auth",
                        store_token_in_metadata=False).collect()
    assert out[0]["@splunk_token"] == "Splunk tok123"
