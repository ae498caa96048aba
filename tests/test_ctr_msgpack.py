"""ctraces msgpack codec vs reference-compiled goldens.

tests/data/ctr_msgpack_golden.bin: produced by compiling the
reference's own ctraces sources (lib/ctraces + lib/cfl + vendored
mpack) with gcc and calling ctr_encode_msgpack_create() on a context
with one resource span (attrs host.name/pid, dropped 1, schema r1),
one scope (svc/1.2, bool attr, dropped 3, schema s1) and two spans —
a full span (ids, trace_state, 4 attr variants, event with attrs,
link, status code 2/boom) and a minimal child span (no ids,
parent inherited, defaults).

tests/data/ctr_msgpack_golden2.bin: a python-encoded blob (array +
kvlist attribute variants, nil scope, empty scope_spans, resource
with dropped count only) that the compiled reference decoder
accepted and re-encoded BYTE-IDENTICALLY.
"""

import json
import os

from fluent_bit_spark.functions.ctr_msgpack import (
    decode_ctr_context,
    encode_ctr_context,
)

DATA = os.path.join(os.path.dirname(__file__), "data")

FULL_SPAN = {
    "trace_id": "000102030405060708090a0b0c0d0eff",
    "span_id": "aabbccddeeff0011",
    "parent_span_id": None, "trace_state": "k=v",
    "name": "GET /x", "kind": 2,
    "start_time_unix_nano": 1700000000000000100,
    "end_time_unix_nano": 1700000000000000900,
    "attributes": {"http.method": "GET", "dur": 0.75, "code": 200,
                   "ok": True},
    "dropped_attributes_count": 2, "dropped_events_count": 0,
    "dropped_links_count": 0,
    "events": [{"time_unix_nano": 1700000000000000500,
                "name": "retry", "attributes": {"why": "timeout"},
                "dropped_attributes_count": 4}],
    "links": [{"trace_id": "000102030405060708090a0b0c0d0eff",
               "span_id": "aabbccddeeff0011", "trace_state": "w=z",
               "attributes": None, "dropped_attributes_count": 5}],
    "schema_url": None, "status": {"code": 2, "message": "boom"},
}

CHILD_SPAN = {
    "trace_id": None, "span_id": None,
    "parent_span_id": "aabbccddeeff0011", "trace_state": None,
    "name": "sub", "kind": 1,
    "start_time_unix_nano": 1700000000000001000,
    "end_time_unix_nano": 1700000000000001100,
    "attributes": {}, "dropped_attributes_count": 0,
    "dropped_events_count": 0, "dropped_links_count": 0,
    "events": [], "links": [], "schema_url": None,
    "status": {"code": 0, "message": None},
}

CONTEXT = [{
    "resource": {"attributes": {"host.name": "web-1", "pid": 4242},
                 "dropped_attributes_count": 1},
    "schema_url": "https://schema/r1",
    "scope_spans": [{
        "scope": {"name": "svc", "version": "1.2",
                  "attributes": {"inst": True},
                  "dropped_attributes_count": 3},
        "schema_url": "https://schema/s1",
        "spans": [FULL_SPAN, CHILD_SPAN],
    }],
}]

CONTEXT2 = [
    {"resource": {"attributes": {"arr": [1, "two", 3.5, True],
                                 "kv": {"a": 1, "b": "x"}},
                  "dropped_attributes_count": 0},
     "schema_url": None,
     "scope_spans": [{"scope": None, "schema_url": None,
                      "spans": [{
                          "trace_id": "00" * 16, "span_id": "11" * 8,
                          "parent_span_id": None, "trace_state": None,
                          "name": "s1", "kind": 3,
                          "start_time_unix_nano": 10,
                          "end_time_unix_nano": 20,
                          "attributes": {},
                          "dropped_attributes_count": 0,
                          "dropped_events_count": 1,
                          "dropped_links_count": 2,
                          "events": [], "links": [],
                          "schema_url": "https://x",
                          "status": {"code": 1, "message": None}}]}]},
    {"resource": {"attributes": {}, "dropped_attributes_count": 9},
     "schema_url": "u2", "scope_spans": []},
]


def test_encode_matches_reference_bytes():
    golden = open(os.path.join(DATA, "ctr_msgpack_golden.bin"),
                  "rb").read()
    assert encode_ctr_context(CONTEXT) == golden


def test_encode_matches_reference_round_trip_bytes():
    golden = open(os.path.join(DATA, "ctr_msgpack_golden2.bin"),
                  "rb").read()
    assert encode_ctr_context(CONTEXT2) == golden


def test_decode_golden_flat_rows():
    golden = open(os.path.join(DATA, "ctr_msgpack_golden.bin"),
                  "rb").read()
    rows = decode_ctr_context(golden)
    assert len(rows) == 2
    full, child = rows
    assert full["trace_id"] == "000102030405060708090a0b0c0d0eff"
    assert full["attributes"] == {"http.method": "GET", "dur": 0.75,
                                  "code": 200, "ok": True}
    assert full["events"][0]["dropped_attributes_count"] == 4
    assert full["links"][0]["trace_state"] == "w=z"
    assert full["links"][0]["attributes"] is None
    assert full["status_code"] == 2
    assert full["status_message"] == "boom"
    assert full["resource_attributes"]["pid"] == 4242
    assert full["scope_name"] == "svc"
    assert full["scope_schema_url"] == "https://schema/s1"
    assert full["flags"] is None  # not on the msgpack wire
    assert child["parent_span_id"] == "aabbccddeeff0011"
    assert child["trace_id"] is None
    assert child["kind"] == 1  # ctr_span_create default: internal
    assert child["attributes"] == {}


def test_decode_variant_attributes():
    rows = decode_ctr_context(
        open(os.path.join(DATA, "ctr_msgpack_golden2.bin"),
             "rb").read())
    assert len(rows) == 1
    r = rows[0]
    assert r["resource_attributes"]["arr"] == [1, "two", 3.5, True]
    assert r["resource_attributes"]["kv"] == {"a": 1, "b": "x"}
    assert r["scope_name"] is None
    assert r["dropped_events_count"] == 1


def test_spark_export_parse_round_trip(spark):
    from pyspark.sql import functions as F

    from fluent_bit_spark.functions.ctr_msgpack import (
        ctr_msgpack_export,
        parse_ctr_msgpack_df,
    )

    e = F.col("id")
    rows = spark.range(24).select(
        F.lit("k").alias("chunk"),
        F.concat(F.lit('{"host":"h'), (e % 3).cast("string"),
                 F.lit('"}')).alias("resource_attributes"),
        F.lit("https://r").alias("resource_schema_url"),
        F.lit(0).cast("long")
        .alias("resource_dropped_attributes_count"),
        F.lit("svc").alias("scope_name"),
        F.lit("1").alias("scope_version"),
        F.lit(None).cast("string").alias("scope_attributes"),
        F.lit(0).cast("long")
        .alias("scope_dropped_attributes_count"),
        F.lit(None).cast("string").alias("scope_schema_url"),
        F.lower(F.lpad(F.hex(e + 1), 32, "0")).alias("trace_id"),
        F.lower(F.lpad(F.hex(e * 7 + 1), 16, "0")).alias("span_id"),
        F.lit(None).cast("string").alias("parent_span_id"),
        F.concat(F.lit("op"), (e % 4).cast("string")).alias("name"),
        (e % 5).cast("int").alias("kind"),
        F.lit(None).cast("string").alias("trace_state"),
        F.lit(None).cast("long").alias("flags"),
        (e + 100).alias("start_time_unix_nano"),
        (e + 200).alias("end_time_unix_nano"),
        (e % 3).cast("int").alias("status_code"),
        F.lit(None).cast("string").alias("status_message"),
        F.lit(0).cast("long").alias("dropped_attributes_count"),
        F.lit(0).cast("long").alias("dropped_events_count"),
        F.lit(0).cast("long").alias("dropped_links_count"),
        F.concat(F.lit('{"n":'), (e % 9).cast("string"),
                 F.lit('}')).alias("attributes"),
        F.lit("[]").alias("events"),
        F.lit("[]").alias("links"),
    )
    blobs = ctr_msgpack_export(rows, "chunk")
    got = parse_ctr_msgpack_df(blobs).collect()
    assert len(got) == 24
    assert sorted(int(json.loads(r["attributes"])["n"])
                  for r in got) == sorted(i % 9 for i in range(24))
    assert {r["scope_name"] for r in got} == {"svc"}
    # resource grouping: 3 hosts -> 3 resource groups in one blob
    assert blobs.count() == 1
