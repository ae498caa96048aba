"""OTLP metrics protobuf codec vs the cmetrics reference
(lib/cmetrics/src/cmt_decode_opentelemetry.c / cmt_encode_opentelemetry.c)."""

import json
import struct

import pytest

from fluent_bit_spark.functions.otlp_metrics import (
    OtlpMetricsDecodeError,
    _enc_uvarint,
    _ld,
    decode_metrics_payload,
    encode_metrics_payload,
    otlp_metrics_export,
    parse_otlp_metrics_df,
)


# ------------------------------------------------- low-level builders


def any_str(v):
    return _ld(1, v.encode())


def any_bool(v):
    return _enc_uvarint(2 << 3 | 0) + _enc_uvarint(1 if v else 0)


def any_int(v):
    return _enc_uvarint(3 << 3 | 0) + _enc_uvarint(v & ((1 << 64) - 1))


def any_double(v):
    return _enc_uvarint(4 << 3 | 1) + struct.pack("<d", v)


def any_kvlist():
    return _ld(6, _ld(1, _ld(1, b"k") + _ld(2, any_str("v"))))


def kv(key, any_value=None):
    body = _ld(1, key.encode())
    if any_value is not None:
        body += _ld(2, any_value)
    return body


def number_point(ts=0, as_double=None, as_int=None, attrs=()):
    out = bytearray()
    if ts:
        out += _enc_uvarint(3 << 3 | 1) + struct.pack("<Q", ts)
    if as_double is not None:
        out += _enc_uvarint(4 << 3 | 1) + struct.pack("<d", as_double)
    if as_int is not None:
        out += _enc_uvarint(6 << 3 | 1) + struct.pack(
            "<q", as_int
        )
    for a in attrs:
        out += _ld(7, a)
    return bytes(out)


def hist_point(ts, count, total, buckets, bounds, attrs=()):
    out = bytearray()
    out += _enc_uvarint(3 << 3 | 1) + struct.pack("<Q", ts)
    out += _enc_uvarint(4 << 3 | 1) + struct.pack("<Q", count)
    out += _enc_uvarint(5 << 3 | 1) + struct.pack("<d", total)
    if buckets:
        out += _ld(6, struct.pack(f"<{len(buckets)}Q", *buckets))
    if bounds:
        out += _ld(7, struct.pack(f"<{len(bounds)}d", *bounds))
    for a in attrs:
        out += _ld(9, a)
    return bytes(out)


def summary_point(ts, count, total, qv, attrs=()):
    out = bytearray()
    out += _enc_uvarint(3 << 3 | 1) + struct.pack("<Q", ts)
    out += _enc_uvarint(4 << 3 | 1) + struct.pack("<Q", count)
    out += _enc_uvarint(5 << 3 | 1) + struct.pack("<d", total)
    for q, v in qv:
        out += _ld(
            6,
            _enc_uvarint(1 << 3 | 1) + struct.pack("<d", q)
            + _enc_uvarint(2 << 3 | 1) + struct.pack("<d", v),
        )
    for a in attrs:
        out += _ld(7, a)
    return bytes(out)


def metric(name, data_field, points, description=None, extra=b""):
    body = _ld(1, name.encode())
    if description is not None:
        body += _ld(2, description.encode())
    inner = b"".join(_ld(1, p) for p in points) + extra
    return body + _ld(data_field, inner)


def sum_metric(name, points, temporality=2, monotonic=True, **kw):
    extra = b""
    if temporality:
        extra += _enc_uvarint(2 << 3 | 0) + _enc_uvarint(temporality)
    if monotonic:
        extra += _enc_uvarint(3 << 3 | 0) + _enc_uvarint(1)
    return metric(name, 7, points, extra=extra, **kw)


def request(metrics, resource_attrs=(), scope=b"", schema=None,
            scope_schema=None):
    scope_metrics = _ld(1, scope)
    scope_metrics += b"".join(_ld(2, m) for m in metrics)
    if scope_schema:
        scope_metrics += _ld(3, scope_schema.encode())
    resource = b"".join(_ld(1, a) for a in resource_attrs)
    rm = _ld(1, resource) + _ld(2, scope_metrics)
    if schema:
        rm += _ld(3, schema.encode())
    return _ld(1, rm)


# ------------------------------------------------------------- decode


def test_gauge_and_counter_kinds():
    buf = request([
        sum_metric("hits", [number_point(ts=7, as_double=2.5)]),
        metric("temp", 5, [number_point(ts=9, as_double=1.5)]),
    ])
    (ctx,) = decode_metrics_payload(buf)
    (c,) = ctx["counters"]
    assert c["name"] == "hits"
    assert c["temporality"] == "cumulative"
    assert c["allow_reset"] is False
    assert c["static_set"] and c["static_sample"]["value"] == 2.5
    (g,) = ctx["gauges"]
    assert g["static_sample"] == {"ts": 9, "value": 1.5,
                                  "label_values": []}


def test_negative_as_int_clamps_to_zero():
    # decode_numerical_data_point :454-461: as_int < 0 -> 0
    buf = request([metric("m", 5, [number_point(ts=1, as_int=-5),
                                   number_point(ts=2, as_int=41)])])
    (ctx,) = decode_metrics_payload(buf)
    (g,) = ctx["gauges"]
    assert g["static_sample"]["value"] == 0.0
    assert g["samples"][0]["value"] == 41.0


def test_static_sample_rule():
    # first zero-attr point is static; later zero-attr points become
    # list samples with an empty label set
    a = kv("path", any_str("/"))
    buf = request([metric("m", 5, [
        number_point(ts=1, as_double=1.0),
        number_point(ts=2, as_double=2.0, attrs=[a]),
        number_point(ts=3, as_double=3.0),
    ])])
    (ctx,) = decode_metrics_payload(buf)
    (g,) = ctx["gauges"]
    assert g["static_sample"]["ts"] == 1
    assert [s["ts"] for s in g["samples"]] == [2, 3]
    assert g["samples"][0]["label_values"] == ["/"]
    assert g["samples"][1]["label_values"] == []
    assert g["label_keys"] == ["path"]


def test_label_value_stringification():
    # :368-396 — bool %d, int PRIi64, double %.17g, kvlist -> NULL
    attrs = [
        kv("s", any_str("x")),
        kv("b", any_bool(True)),
        kv("i", any_int(-3)),
        kv("d", any_double(0.1)),
        kv("k", any_kvlist()),
    ]
    buf = request([metric("m", 5, [
        number_point(ts=0, as_double=1.0, attrs=attrs)])])
    (ctx,) = decode_metrics_payload(buf)
    (g,) = ctx["gauges"]
    assert g["label_keys"] == ["s", "b", "i", "d", "k"]
    assert g["samples"][0]["label_values"] == [
        "x", "1", "-3", "%.17g" % 0.1, None]


def test_missing_any_value_compacts_the_list():
    # :366 `continue` — an attribute with no AnyValue appends NOTHING,
    # so the next key's value shifts into its slot
    attrs = [kv("a", None), kv("b", any_str("bee"))]
    buf = request([metric("m", 5, [
        number_point(ts=0, as_double=1.0, attrs=attrs)])])
    (ctx,) = decode_metrics_payload(buf)
    (g,) = ctx["gauges"]
    assert g["label_keys"] == ["a", "b"]
    assert g["samples"][0]["label_values"] == ["bee"]


def test_too_many_attributes_rejects_payload():
    attrs = [kv(f"k{i}", any_str("v")) for i in range(128)]
    buf = request([metric("m", 5, [
        number_point(ts=0, as_double=1.0, attrs=attrs)])])
    with pytest.raises(OtlpMetricsDecodeError):
        decode_metrics_payload(buf)


def test_description_defaults_to_dash():
    buf = request([
        metric("a", 5, [number_point(as_double=1.0)]),
        metric("b", 5, [number_point(as_double=1.0)], description=""),
        metric("c", 5, [number_point(as_double=1.0)], description="real"),
    ])
    (ctx,) = decode_metrics_payload(buf)
    assert [m["description"] for m in ctx["gauges"]] == ["-", "-", "real"]


def test_exponential_histogram_silently_dropped():
    # decode_metrics_entry has no branch for data case 10
    body = _ld(1, b"eh") + _ld(10, _ld(1, b""))
    buf = request([body, metric("keep", 5, [number_point(as_double=1.0)])])
    (ctx,) = decode_metrics_payload(buf)
    assert not ctx["histograms"] and len(ctx["gauges"]) == 1


def test_histogram_decode_and_bucket_validation():
    buf = request([metric("lat", 9, [
        hist_point(5, 10, 99.5, [1, 2, 7], [0.1, 1.0]),
        hist_point(6, 3, 8.0, [0, 1, 2], [0.1, 1.0],
                   attrs=[kv("h", any_str("a"))]),
    ])])
    (ctx,) = decode_metrics_payload(buf)
    (h,) = ctx["histograms"]
    assert h["bounds"] == [0.1, 1.0]
    assert h["static_sample"]["bucket_counts"] == [1, 2, 7]
    assert h["static_sample"]["count"] == 10
    assert h["static_sample"]["sum"] == 99.5
    assert h["samples"][0]["label_values"] == ["a"]

    bad = request([metric("lat", 9, [
        hist_point(5, 10, 1.0, [1, 2, 7, 9], [0.1, 1.0])])])
    with pytest.raises(OtlpMetricsDecodeError):
        decode_metrics_payload(bad)


def test_summary_decode_quantiles_from_first_point():
    buf = request([metric("rt", 11, [
        summary_point(1, 4, 2.0, [(0.5, 0.1), (0.9, 0.2)]),
        summary_point(2, 6, 3.0, [(0.5, 0.15), (0.9, 0.25)],
                      attrs=[kv("q", any_str("b"))]),
    ])])
    (ctx,) = decode_metrics_payload(buf)
    (s,) = ctx["summaries"]
    assert s["quantiles"] == [0.5, 0.9]
    assert s["static_sample"]["quantile_values"] == [0.1, 0.2]
    assert s["static_sample"]["count"] == 4
    assert s["samples"][0]["quantile_values"] == [0.15, 0.25]


def test_resource_scope_metadata():
    scope = _ld(1, b"lib") + _ld(2, b"1.2") + \
        _ld(3, kv("sa", any_str("sv"))) + _enc_uvarint(4 << 3 | 0) + \
        _enc_uvarint(3)
    buf = request(
        [metric("m", 5, [number_point(as_double=1.0)])],
        resource_attrs=[kv("host", any_str("web-1")),
                        kv("pid", any_int(42))],
        scope=scope,
        schema="https://r",
        scope_schema="https://s",
    )
    (ctx,) = decode_metrics_payload(buf)
    assert ctx["resource_attrs"] == {"host": "web-1", "pid": 42}
    assert ctx["scope"] == {"name": "lib", "version": "1.2",
                            "dropped": 3, "attrs": {"sa": "sv"}}
    assert ctx["resource_schema_url"] == "https://r"
    assert ctx["scope_schema_url"] == "https://s"


def test_one_context_per_scope_metrics():
    sm1 = _ld(1, b"") + _ld(2, metric("a", 5, [number_point(as_double=1.0)]))
    sm2 = _ld(1, b"") + _ld(2, metric("b", 5, [number_point(as_double=2.0)]))
    rm = _ld(1, b"") + _ld(2, sm1) + _ld(2, sm2)
    ctxs = decode_metrics_payload(_ld(1, rm))
    assert len(ctxs) == 2
    assert ctxs[0]["gauges"][0]["name"] == "a"
    assert ctxs[1]["gauges"][0]["name"] == "b"


# ----------------------------------------------------- encode / round-trip


def _mk_ctx():
    buf = request(
        [
            metric("temp", 5, [
                number_point(ts=9, as_double=1.5),
                number_point(ts=10, as_double=2.5,
                             attrs=[kv("core", any_int(1))]),
            ]),
            sum_metric("hits", [number_point(ts=7, as_double=4.0)],
                       temporality=1, monotonic=True),
            metric("lat", 9, [hist_point(5, 10, 99.5, [1, 2, 7],
                                         [0.1, 1.0])]),
            metric("rt", 11, [summary_point(1, 4, 2.0,
                                            [(0.5, 0.1), (0.9, 0.2)])]),
        ],
        resource_attrs=[kv("host", any_str("web-1"))],
        scope=_ld(1, b"lib") + _ld(2, b"1.2"),
        schema="https://r",
        scope_schema="https://s",
    )
    (ctx,) = decode_metrics_payload(buf)
    return ctx


def test_encode_round_trip():
    ctx = _mk_ctx()
    blob = encode_metrics_payload(ctx)
    (back,) = decode_metrics_payload(blob)
    # counters first, then gauges/summaries/histograms (:2539-2583)
    assert back["counters"][0]["name"] == "hits"
    assert back["counters"][0]["temporality"] == "delta"
    assert back["counters"][0]["allow_reset"] is False
    assert back["gauges"][0]["static_sample"]["value"] == 1.5
    assert back["gauges"][0]["samples"][0]["label_values"] == ["1"]
    assert back["histograms"][0]["bounds"] == [0.1, 1.0]
    assert back["histograms"][0]["static_sample"]["bucket_counts"] == \
        [1, 2, 7]
    assert back["histograms"][0]["static_sample"]["sum"] == 99.5
    assert back["summaries"][0]["quantiles"] == [0.5, 0.9]
    assert back["summaries"][0]["static_sample"]["quantile_values"] == \
        [0.1, 0.2]
    assert back["resource_attrs"] == {"host": "web-1"}
    assert back["scope"]["name"] == "lib"
    assert back["resource_schema_url"] == "https://r"
    assert back["scope_schema_url"] == "https://s"


def test_histogram_temporality_lost_on_round_trip():
    # pack_basic_type :2410-2425 computes temporality only for counters
    buf = request([metric("lat", 9, [
        hist_point(5, 1, 1.0, [1], [])],
        extra=_enc_uvarint(2 << 3 | 0) + _enc_uvarint(2))])
    (ctx,) = decode_metrics_payload(buf)
    blob = encode_metrics_payload(ctx)
    # the re-encoded Histogram message carries no temporality field
    assert _enc_uvarint(2 << 3 | 0) + _enc_uvarint(2) not in blob


def test_encode_always_as_double_and_zero_start_time():
    buf = request([metric("m", 5, [number_point(ts=3, as_int=7)])])
    (ctx,) = decode_metrics_payload(buf)
    blob = encode_metrics_payload(ctx)
    (back,) = decode_metrics_payload(blob)
    assert back["gauges"][0]["static_sample"]["value"] == 7.0
    # as_int field (6, wiretype 1) never appears in encoded output
    assert _enc_uvarint(6 << 3 | 1) not in blob


def test_empty_metric_skipped_on_encode():
    ctx = {
        "counters": [], "untyped": [], "summaries": [], "histograms": [],
        "gauges": [{
            "name": "empty", "description": "-", "label_keys": [],
            "static_sample": None, "samples": [], "static_set": False,
        }],
        "scope": {"name": None, "version": None, "dropped": 0, "attrs": {}},
    }
    (back,) = decode_metrics_payload(encode_metrics_payload(ctx))
    assert back["gauges"] == []


# -------------------------------------------------------------- spark


def test_parse_otlp_metrics_df(spark):
    good = request([
        sum_metric("hits", [number_point(ts=7, as_double=2.0),
                            number_point(ts=8, as_double=3.0,
                                         attrs=[kv("p", any_str("/"))])]),
        metric("lat", 9, [hist_point(5, 10, 99.5, [1, 2, 7],
                                     [0.1, 1.0])]),
    ])
    bad = request([metric("m", 5, [number_point(
        as_double=1.0, attrs=[kv(f"k{i}", any_str("v"))
                              for i in range(128)])])])
    df = spark.createDataFrame(
        [(bytearray(good),), (bytearray(bad),), (None,)], "data binary")
    rows = parse_otlp_metrics_df(df).collect()
    assert len(rows) == 3  # the 128-attribute payload yields nothing
    by_name = {}
    for r in rows:
        by_name.setdefault(r.name, []).append(r)
    assert by_name["hits"][0].mtype == "counter"
    assert by_name["hits"][0].temporality == "cumulative"
    assert json.loads(by_name["hits"][1].labels) == {"p": "/"}
    assert by_name["lat"][0].bucket_counts == [1, 2, 7]
    assert by_name["lat"][0].explicit_bounds == [0.1, 1.0]
    assert by_name["lat"][0].hist_count == 10


def test_otlp_metrics_export_round_trip(spark):
    good = request([
        sum_metric("hits", [number_point(ts=7, as_double=2.0)]),
        metric("temp", 5, [number_point(ts=9, as_double=1.5,
                                        attrs=[kv("core", any_int(0))])]),
    ])
    df = spark.createDataFrame([(bytearray(good),)], "data binary")
    rows = parse_otlp_metrics_df(df).withColumn(
        "tag", __import__("pyspark.sql.functions",
                          fromlist=["lit"]).lit("metrics.0"))
    out = otlp_metrics_export(rows, "tag").collect()
    assert len(out) == 1
    (back,) = decode_metrics_payload(bytes(out[0].payload))
    assert back["counters"][0]["name"] == "hits"
    assert back["counters"][0]["static_sample"]["value"] == 2.0
    assert back["gauges"][0]["samples"][0]["label_values"] == ["0"]
