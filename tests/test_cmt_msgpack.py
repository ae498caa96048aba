"""cmetrics msgpack context codec vs a reference-compiled golden.

tests/data/cmt_msgpack_golden.bin was produced by compiling the
reference's own cmetrics sources (lib/cmetrics + lib/cfl + vendored
mpack/xxhash) with gcc and calling cmt_encode_msgpack_create() on a
context holding: static label job=fb; counter fb_node_req_total
{path} with samples /a=7.5@..789, /b=9.0@..790 and a label-less
static 4.0@..791; gauge fb_mem{host} h0=33.25@..792; untyped raw
(static 2.5@..793); summary fb_node_rt{app} quantiles [0.5,0.99]
a1: qvals [1.25,4.75] sum 6.5 count 3; histogram fb_node_lat{shard}
bounds [0.5,2.0] s0: observations 0.25/1.5/9.0 (stored cumulative
cells [1,2,3], sum 10.75, count 3).

The python encoder must reproduce that blob BYTE-FOR-BYTE — which
also pins the XXH3 metric hashes, the raw-d64-bits summary packing,
the static-first value order and every map key order.
"""

import os
import struct

from fluent_bit_spark.functions.cmt_msgpack import (
    decode_cmt_context,
    encode_cmt_context,
    fqname,
    metric_hash,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "cmt_msgpack_golden.bin")

FAMILIES = [
    {"type": "counter", "ns": "fb", "ss": "node", "name": "req_total",
     "desc": "Total requests", "label_keys": ["path"],
     "aggregation_type": 2,
     "values": [
         {"ts": 1700000000123456789, "labels": ["/a"], "value": 7.5},
         {"ts": 1700000000123456790, "labels": ["/b"], "value": 9.0},
         {"ts": 1700000000123456791, "labels": [], "value": 4.0},
     ]},
    {"type": "gauge", "ns": "fb", "ss": "", "name": "mem",
     "desc": "-", "label_keys": ["host"],
     "values": [{"ts": 1700000000123456792, "labels": ["h0"],
                 "value": 33.25}]},
    {"type": "untyped", "ns": "", "ss": "", "name": "raw",
     "desc": "d", "label_keys": [],
     "values": [{"ts": 1700000000123456793, "labels": [],
                 "value": 2.5}]},
    {"type": "summary", "ns": "fb", "ss": "node", "name": "rt",
     "desc": "rt sum", "label_keys": ["app"],
     "quantiles": [0.5, 0.99],
     "values": [{"ts": 1700000000123456794, "labels": ["a1"],
                 "quantile_values": [1.25, 4.75], "sum": 6.5,
                 "count": 3, "quantiles_set": 1}]},
    {"type": "histogram", "ns": "fb", "ss": "node", "name": "lat",
     "desc": "lat h", "label_keys": ["shard"],
     "buckets": [0.5, 2.0],
     "values": [{"ts": 1700000000123456795, "labels": ["s0"],
                 "buckets": [1, 2, 3], "sum": 10.75, "count": 3}]},
]


def test_encode_matches_reference_bytes():
    golden = open(GOLDEN, "rb").read()
    mine = encode_cmt_context(FAMILIES, static_labels=[("job", "fb")])
    assert mine == golden


def test_decode_golden_round_trip():
    rows = decode_cmt_context(open(GOLDEN, "rb").read())
    assert len(rows) == 7
    by = {(r["mtype"], r["labels"]): r for r in rows}
    static = by[("counter", "{}")]
    assert static["static"] and static["hash"] == "0"
    assert static["value"] == 4.0
    a = by[("counter", '{"path":"/a"}')]
    assert a["hash"] == str(metric_hash("fb_node_req_total", ["/a"]))
    assert a["aggregation_type"] == 2
    summ = by[("summary", '{"app":"a1"}')]
    # raw d64 bit patterns survive the uint round trip exactly
    assert summ["quantile_values"] == [1.25, 4.75]
    assert summ["sum_sum"] == 6.5 and summ["sum_count"] == 3
    assert summ["quantiles"] == [0.5, 0.99]
    hist = by[("histogram", '{"shard":"s0"}')]
    assert hist["bucket_counts"] == [1, 2, 3]
    assert hist["bucket_bounds"] == [0.5, 2.0]
    assert hist["hist_sum"] == 10.75 and hist["hist_count"] == 3
    assert rows[0]["static_labels"] == '{"job":"fb"}'
    assert by[("untyped", "{}")]["value"] == 2.5
    assert by[("gauge", '{"host":"h0"}')]["ns"] == "fb"
    assert by[("gauge", '{"host":"h0"}')]["ss"] == ""


def test_fqname_rules():
    # cmt_opts.c:41-78 underscore composition
    assert fqname("fb", "node", "x") == "fb_node_x"
    assert fqname("fb", "", "x") == "fb_x"
    assert fqname("", "sub", "x") == "sub_x"
    assert fqname("", "", "x") == "x"


def test_summary_raw_bits_quirk():
    # the summary branch packs sum/quantiles as uint64 IEEE-754 bit
    # patterns (cmt_encode_msgpack.c:224-236) — check the wire holds
    # the bits, not a msgpack double
    blob = encode_cmt_context([
        {"type": "summary", "ns": "", "ss": "", "name": "s",
         "desc": "", "label_keys": [], "quantiles": [0.5],
         "values": [{"ts": 1, "labels": [], "quantile_values": [1.5],
                     "sum": 2.5, "count": 1, "quantiles_set": 1}]}])
    bits_15 = struct.unpack("<Q", struct.pack("<d", 1.5))[0]
    bits_25 = struct.unpack("<Q", struct.pack("<d", 2.5))[0]
    # both appear as msgpack uint64 (0xcf + BE bits), not 0xcb doubles
    assert b"\xcf" + struct.pack(">Q", bits_15) in blob
    assert b"\xcf" + struct.pack(">Q", bits_25) in blob
    assert b"\xcb" + struct.pack(">d", 1.5) not in blob
    assert b"\xcb" + struct.pack(">d", 2.5) not in blob
    rows = decode_cmt_context(blob)
    assert rows[0]["quantile_values"] == [1.5]
    assert rows[0]["sum_sum"] == 2.5


def test_undecodable_chunk_yields_no_rows(spark):
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    from fluent_bit_spark.functions.cmt_msgpack import (
        parse_cmt_msgpack_df,
    )

    df = spark.createDataFrame(
        [(bytearray(b"\xff\xff\xff"),), (None,)], "data binary")
    assert parse_cmt_msgpack_df(df).count() == 0


def test_spark_export_parse_round_trip(spark):
    from pyspark.sql import functions as F

    from fluent_bit_spark.functions.cmt_msgpack import (
        cmt_msgpack_export,
        parse_cmt_msgpack_df,
    )

    rows = spark.range(30).select(
        F.lit("k").alias("chunk"),
        F.lit("counter").alias("mtype"), F.lit("fb").alias("ns"),
        F.lit("node").alias("ss"), F.lit("req").alias("name"),
        F.lit("d").alias("desc"), F.lit(2).alias("aggregation_type"),
        F.concat(F.lit('{"p":"x'), (F.col("id") % 3).cast("string"),
                 F.lit('"}')).alias("labels"),
        (F.col("id") + 100).alias("ts"),
        F.col("id").cast("double").alias("value"),
        F.lit(None).cast("array<long>").alias("bucket_counts"),
        F.lit(None).cast("array<double>").alias("explicit_bounds"),
        F.lit(None).cast("double").alias("hist_sum"),
        F.lit(None).cast("long").alias("hist_count"),
        F.lit(None).cast("array<double>").alias("quantiles"),
        F.lit(None).cast("array<double>").alias("quantile_values"),
        F.lit(None).cast("double").alias("sum_sum"),
        F.lit(None).cast("long").alias("sum_count"),
    )
    blobs = cmt_msgpack_export(rows, "chunk",
                               static_labels=[("job", "fb")])
    got = parse_cmt_msgpack_df(
        blobs.select(F.col("data"))).collect()
    assert len(got) == 30
    assert {r["name"] for r in got} == {"req"}
    assert sorted(r["value"] for r in got) == [float(i)
                                               for i in range(30)]
    assert all(r["static_labels"] == '{"job":"fb"}' for r in got)
    # every labeled metric hash is the real XXH3 of fqname+values
    import json as _json

    from fluent_bit_spark.functions.cmt_msgpack import metric_hash
    for r in got:
        vals = list(_json.loads(r["labels"]).values())
        assert r["hash"] == str(metric_hash("fb_node_req", vals))


GOLDEN2 = os.path.join(os.path.dirname(__file__), "data",
                       "cmt_msgpack_golden2.bin")

FAMILIES2 = [
    {"type": "histogram", "ns": "a", "ss": "", "name": "h",
     "desc": "x", "label_keys": ["k1", "k2"],
     "buckets": [0.1, 1.0, 10.0],
     "values": [
         {"ts": 5, "labels": ["v1", "v2"],
          "buckets": [1, 2, 3, 4], "sum": 3.25, "count": 4},
         {"ts": 6, "labels": [], "buckets": [0, 0, 0, 1],
          "sum": 99.0, "count": 1},
     ]},
    {"type": "untyped", "ns": "", "ss": "s", "name": "u",
     "desc": "", "label_keys": [],
     "values": [{"ts": 7, "labels": [], "value": 0.125}]},
]


def test_encode_matches_reference_round_trip_bytes():
    """Second golden: the python blob for FAMILIES2 was fed to the
    COMPILED reference decoder (cmt_decode_msgpack_create) and
    re-encoded — the C accepted it and produced byte-identical
    output, which is what this fixture holds. Covers a static
    histogram metric, two label keys, and empty static_labels."""
    golden = open(GOLDEN2, "rb").read()
    assert encode_cmt_context(FAMILIES2, static_labels=[]) == golden
    rows = decode_cmt_context(golden)
    assert len(rows) == 3
    static_hist = [r for r in rows
                   if r["mtype"] == "histogram" and r["static"]][0]
    assert static_hist["hash"] == "0"
    assert static_hist["bucket_counts"] == [0, 0, 0, 1]
