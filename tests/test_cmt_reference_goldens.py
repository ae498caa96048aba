"""Metrics text/wire encoders vs outputs of the COMPILED reference.

The fixtures under tests/data/ were produced by compiling the
reference's own cmetrics sources (lib/cmetrics + lib/cfl + vendored
mpack/xxhash/protobuf-c) with gcc and running each encoder over ONE
shared context: static label app=api; counter fb_node_req_total
{path} (/a=7.5@..789, /b=9.0@..790, static 4.0@..791, desc "Total
requests"); gauge fb_mem{host} h0=33.25@..792; untyped raw (static
2.5@..793, desc d); summary fb_node_rt{app} quantiles [0.5,0.99]
a1: [1.25,4.75] sum 6.5 count 3 @..794; histogram fb_node_lat
{shard} bounds [0.5,2.0] s0: observations 0.25/1.5/9.0 (stored
cumulative cells [1,2,3], sum 10.75, count 3) @..795. Base
timestamp 1700000000123456789ns.

- cmt_influx_golden.txt    cmt_encode_influx_create
- cmt_splunk_golden.txt    cmt_encode_splunk_hec_create(web-1, idx,
                           src, stype) — includes the uint64_t _sum
                           truncation bug (10.75 -> "10.0")
- cmt_text_golden.txt      cmt_encode_text_create
- cmt_emf_golden.txt       cmt_encode_cloudwatch_emf_create
                           (msgpack stream, wrap_array false)
- remote_write_golden.bin  cmt_encode_prometheus_remote_write_create
                           with runtime-fresh timestamps base+1..+6
                           (base recorded in
                           remote_write_golden_base.txt, the encoder
                           drops >1h-stale metrics against real now)

Each test feeds the equivalent rows through this repo's encoder and
compares against the reference output exactly (as multisets where
the reference's family walk order differs from our row order).
"""

import json
import os
import re

from pyspark.sql import functions as F

DATA = os.path.join(os.path.dirname(__file__), "data")
B = 1700000000123456789


def _read(name: str, mode: str = "r"):
    with open(os.path.join(DATA, name), mode) as f:
        return f.read()


def _metric_rows(spark, with_measurement=False, with_subsystem=False,
                 with_ns=False):
    def tags(*pairs):
        return [{"key": k, "value": v} for k, v in pairs]

    base = {"value": None, "bucket_counts": None,
            "explicit_bounds": None, "hist_sum": None,
            "hist_count": None, "quantiles": None,
            "quantile_values": None, "sum_sum": None,
            "sum_count": None}
    rows = [
        dict(base, mtype="counter", name="req_total", tags=tags(),
             ts=B + 2, value=4.0),
        dict(base, mtype="counter", name="req_total",
             tags=tags(("path", "/a")), ts=B, value=7.5),
        dict(base, mtype="counter", name="req_total",
             tags=tags(("path", "/b")), ts=B + 1, value=9.0),
        dict(base, mtype="gauge", name="mem",
             tags=tags(("host", "h0")), ts=B + 3, value=33.25),
        dict(base, mtype="untyped", name="raw", tags=tags(),
             ts=B + 4, value=2.5),
        dict(base, mtype="summary", name="rt",
             tags=tags(("app", "a1")), ts=B + 5,
             quantiles=[0.5, 0.99], quantile_values=[1.25, 4.75],
             sum_sum=6.5, sum_count=3),
        dict(base, mtype="histogram", name="lat",
             tags=tags(("shard", "s0")), ts=B + 6,
             bucket_counts=[1, 2, 3], explicit_bounds=[0.5, 2.0],
             hist_sum=10.75, hist_count=3),
    ]
    meas = {"counter": "fb_node", "summary": "fb_node",
            "histogram": "fb_node", "gauge": "fb", "untyped": ""}
    full = {"counter": "fb_node_req_total", "gauge": "fb_mem",
            "untyped": "raw", "summary": "fb_node_rt",
            "histogram": "fb_node_lat"}
    for r in rows:
        if with_measurement:
            r["measurement"] = meas[r["mtype"]]
        if with_subsystem:
            r["subsystem"] = ("node" if r["mtype"] in
                              ("counter", "summary", "histogram")
                              else "")
        if with_ns:
            r["ns"] = ("fb" if r["mtype"] != "untyped" else "")
            r["name"] = full[r["mtype"]]
            # EMF Dimensions name ALL the family's label keys even
            # for the static sample (pack_basic_header quirk)
            fam_keys = {"counter": ["path"], "gauge": ["host"],
                        "untyped": [], "summary": ["app"],
                        "histogram": ["shard"]}
            r["dim_keys"] = fam_keys[r["mtype"]]
    schema = ("mtype string, name string, "
              "tags array<struct<key:string,value:string>>, ts long, "
              "value double, bucket_counts array<long>, "
              "explicit_bounds array<double>, hist_sum double, "
              "hist_count long, quantiles array<double>, "
              "quantile_values array<double>, sum_sum double, "
              "sum_count long"
              + (", measurement string" if with_measurement else "")
              + (", subsystem string" if with_subsystem else "")
              + (", ns string, dim_keys array<string>"
                 if with_ns else ""))
    return spark.createDataFrame(rows, schema)


def test_influx_matches_reference(spark):
    from fluent_bit_spark.functions.influx_out import cmt_influx_lines

    ref = sorted(_read("cmt_influx_golden.txt").splitlines())
    df = _metric_rows(spark, with_measurement=True)
    got = sorted(r["line"] for r in cmt_influx_lines(
        df, measurement=F.col("measurement"),
        static_labels=[("app", "api")]).collect())
    assert got == ref


def test_text_matches_reference(spark):
    from fluent_bit_spark.functions.text_out import cmt_text_lines

    ref = sorted(_read("cmt_text_golden.txt").splitlines())
    df = _metric_rows(spark, with_ns=True)
    got = sorted(r["line"] for r in cmt_text_lines(
        df, static_labels=[("app", "api")]).collect())
    assert got == ref


def _split_hec(blob: str) -> list[str]:
    parts = re.split(r'(?=\{"host":"web-1","time":)', blob)
    return sorted(p for p in parts if p)


def test_splunk_hec_matches_reference(spark):
    from fluent_bit_spark.functions.hec_out import cmt_splunk_hec_events

    ref = _split_hec(_read("cmt_splunk_golden.txt"))
    df = _metric_rows(spark, with_subsystem=True)
    out = cmt_splunk_hec_events(
        df, host="web-1", index="idx", source="src",
        source_type="stype",
        static_labels=[("app", "api")]).collect()
    got = _split_hec("".join(r["event"] for r in out))
    assert got == ref


def _unpack_stream(buf: bytes) -> list:
    from fluent_bit_spark.wasm.mpack import _Reader, _unpack

    r = _Reader(buf)
    out = []
    while r.i < len(buf):
        out.append(_unpack(r))
    return out


def test_cloudwatch_emf_matches_reference(spark):
    from fluent_bit_spark.functions.cloudwatch_out import cmt_emf_events

    ref = _unpack_stream(_read("cmt_emf_golden.txt", "rb"))
    assert len(ref) == 7
    df = _metric_rows(spark, with_ns=True)
    out = cmt_emf_events(
        df, namespace=F.col("ns"),
        static_labels=[("app", "api")]).collect()
    got = [json.loads(r["event"]) for r in out]

    def norm(v):
        # msgpack doubles vs JSON bare ints: compare numerically
        if isinstance(v, bool):
            return v
        if isinstance(v, int):
            return float(v)
        if isinstance(v, list):
            return [norm(x) for x in v]
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items()}
        return v

    key = lambda d: json.dumps(d, sort_keys=True)
    assert sorted(map(norm, got), key=key) == \
        sorted(map(norm, ref), key=key)


def test_remote_write_matches_reference_bytes():
    from fluent_bit_spark.functions.remote_write_out import (
        build_write_request,
    )

    base = int(_read("remote_write_golden_base.txt").strip())
    golden = _read("remote_write_golden.bin", "rb")

    def row(mtype, name, labels, ts, **kw):
        d = {"mtype": mtype, "name": name, "labels": labels,
             "ts": ts, "value": None, "bucket_counts": None,
             "explicit_bounds": None, "hist_sum": None,
             "hist_count": None, "quantiles": None,
             "quantile_values": None, "sum_sum": None,
             "sum_count": None}
        d.update(kw)
        return d

    rows = [
        row("counter", "fb_node_req_total", {}, base + 3, value=4.0),
        row("counter", "fb_node_req_total", {"path": "/a"},
            base + 1, value=7.5),
        row("counter", "fb_node_req_total", {"path": "/b"},
            base + 2, value=9.0),
        row("gauge", "fb_mem", {"host": "h0"}, base + 4,
            value=33.25),
        row("summary", "fb_node_rt", {"app": "a1"}, base + 5,
            quantiles=[0.5, 0.99], quantile_values=[1.25, 4.75],
            sum_sum=6.5, sum_count=3),
        row("histogram", "fb_node_lat", {"shard": "s0"}, base + 6,
            bucket_counts=[1, 2, 3], explicit_bounds=[0.5, 2.0],
            hist_sum=10.75, hist_count=3),
    ]
    mine = build_write_request(rows, static_labels=[("app", "api")],
                               now_ns=base + 1_000_000_000)
    assert mine == golden


def _prom_family(spark, name, mtype, help_text, rows, label_col,
                 static, lead=None, ts=True):
    from fluent_bit_spark.functions.prom_out import prometheus_text

    lc = label_col or "unused"
    schema = (f"suffix string, lead string, {lc} string, "
              "value double, ts_ms long")
    df = spark.createDataFrame(rows, schema)
    out = prometheus_text(
        spark, df, name, mtype, help_text,
        [label_col] if label_col else [],
        suffix_col="suffix", ts_ms_col="ts_ms" if ts else None,
        static_labels=static,
        lead_label=lead)
    lines = [r["line"] for r in out.collect()]
    return sorted(lines)


def test_prometheus_text_matches_reference(spark):
    """cmt_encode_prometheus_create(add_timestamp=TRUE) golden:
    %.17g values + ms timestamps, static labels after the le/
    quantile lead label and before family labels, the static sample
    printing only static labels, and %g+'.0' bucket captions
    ("2.0")."""
    ref = _read("cmt_prom_golden.txt").splitlines()
    blocks: dict[str, list] = {}
    fam = None
    for ln in ref:
        if ln.startswith("# HELP "):
            fam = ln.split()[2]
            blocks[fam] = []
        blocks[fam].append(ln)
    TS = 1700000000123
    A = [("app", "api")]

    def fam_rows(*rows):
        return [tuple(r) + (TS,) for r in rows]

    got = {
        "fb_node_req_total": _prom_family(
            spark, "fb_node_req_total", "counter", "Total requests",
            fam_rows(("", None, None, 4.0), ("", None, "/a", 7.5),
                     ("", None, "/b", 9.0)),
            "path", A),
        "fb_mem": _prom_family(
            spark, "fb_mem", "gauge", "-",
            fam_rows(("", None, "h0", 33.25)), "host", A),
        "fb_node_rt": _prom_family(
            spark, "fb_node_rt", "summary", "rt sum",
            fam_rows(("", "0.5", "a1", 1.25), ("", "0.99", "a1", 4.75),
                     ("_sum", None, "a1", 6.5),
                     ("_count", None, "a1", 3.0)),
            "app", A, lead=("quantile", "lead")),
        "fb_node_lat": _prom_family(
            spark, "fb_node_lat", "histogram", "lat h",
            fam_rows(("_bucket", "0.5", "s0", 1.0),
                     ("_bucket", "2.0", "s0", 2.0),
                     ("_bucket", "+Inf", "s0", 3.0),
                     ("_sum", None, "s0", 10.75),
                     ("_count", None, "s0", 3.0)),
            "shard", A, lead=("le", "lead")),
        "raw": _prom_family(
            spark, "raw", "untyped", "d",
            fam_rows(("", None, None, 2.5)), None, A),
    }
    for famname, lines in blocks.items():
        assert got[famname] == sorted(lines), famname


def test_prometheus_text_no_timestamp_matches_reference(spark):
    ref = [ln for ln in
           _read("cmt_prom_nots_golden.txt").splitlines()
           if ln.startswith("fb_mem")]
    got = _prom_family(
        spark, "fb_mem", "gauge", "-",
        [("", None, "h0", 33.25, 1700000000123)], "host",
        [("app", "api")], ts=False)
    got = [ln for ln in got if ln.startswith("fb_mem{")]
    assert got == ref


def test_otlp_metrics_encode_matches_reference_bytes():
    """cmt_encode_opentelemetry_create golden: BYTE-identical
    MetricsData — context static labels lead every data point's
    attribute list, empty resource/scope submessages are omitted
    entirely (protobuf-c skips unset members), counter temporality +
    is_monotonic, summary count as fixed64 with quantile pairs, and
    histogram bucket cells + bounds as packed arrays."""
    from fluent_bit_spark.functions.otlp_metrics import (
        _new_metric,
        encode_metrics_payload,
    )

    golden = _read("otlp_metrics_golden.bin", "rb")

    def metric(name, desc, keys, samples, static=None, **extra):
        m = _new_metric(name, desc)
        m["label_keys"] = keys
        m.update(extra)
        if static is not None:
            m["static_set"] = True
            static["label_values"] = []
            m["static_sample"] = static
        m["samples"] = samples
        return m

    T = B
    ctx = {
        "static_labels": [("app", "api")],
        "counters": [metric(
            "fb_node_req_total", "Total requests", ["path"],
            [{"ts": T, "value": 7.5, "label_values": ["/a"]},
             {"ts": T + 1, "value": 9.0, "label_values": ["/b"]}],
            static={"ts": T + 2, "value": 4.0},
            temporality="cumulative", allow_reset=False)],
        "gauges": [metric(
            "fb_mem", "-", ["host"],
            [{"ts": T + 3, "value": 33.25, "label_values": ["h0"]}])],
        "untyped": [metric(
            "raw", "d", [], [],
            static={"ts": T + 4, "value": 2.5})],
        "summaries": [metric(
            "fb_node_rt", "rt sum", ["app"],
            [{"ts": T + 5, "quantile_values": [1.25, 4.75],
              "sum": 6.5, "count": 3, "label_values": ["a1"]}],
            quantiles=[0.5, 0.99])],
        "histograms": [metric(
            "fb_node_lat", "lat h", ["shard"],
            [{"ts": T + 6, "bucket_counts": [1, 2, 3], "sum": 10.75,
              "count": 3, "label_values": ["s0"]}],
            bounds=[0.5, 2.0])],
        "scope": {"name": None, "version": None, "dropped": 0,
                  "attrs": {}},
        "scope_schema_url": None, "resource_attrs": {},
        "resource_dropped": 0, "resource_schema_url": None,
    }
    assert encode_metrics_payload(ctx) == golden


def test_ctr_text_matches_reference(spark):
    """ctr_encode_text_create golden from the compiled reference:
    full resource/scope blocks with attributes + dropped counts +
    schema urls, link entries with the F1BI7 default-id constants
    and the dropped_events_count label that actually prints the
    link's dropped_attr_count, event attribute blocks, the glibc
    "(null)" for a NULL trace_state, and kind names."""
    from fluent_bit_spark.functions.text_out import ctr_text_blocks

    ref = _read("ctr_text_golden.txt")
    A = lambda k, s=None, i=None, d=None, b=None: {
        "key": k, "s": s, "i": i, "d": d, "b": b}
    TID = "000102030405060708090a0b0c0d0eff"
    SID = "aabbccddeeff0011"
    spans = [
        {"grp": "g", "span_order": 0, "name": "GET /x",
         "trace_id_hex": TID, "span_id_hex": SID,
         "parent_span_id_hex": None, "kind": 2,
         "start_nanos": 1700000000000000100,
         "end_nanos": 1700000000000000900,
         "dropped_attr": 2, "dropped_events": 0, "dropped_links": 0,
         "trace_state": "k=v", "status_code": 2,
         "status_message": "boom", "schema_url": None,
         "attrs": [A("http.method", s="GET"), A("dur", d=0.75),
                   A("code", i=200), A("ok", b=True)],
         "events": [{"name": "retry", "ts": 1700000000000000500,
                     "dropped": 4,
                     "attrs": [A("why", s="timeout")]}],
         "links": [{"trace_id_hex": TID, "span_id_hex": SID,
                    "trace_state": "w=z", "dropped": 5,
                    "attrs": None}]},
        {"grp": "g", "span_order": 1, "name": "sub",
         "trace_id_hex": None, "span_id_hex": None,
         "parent_span_id_hex": SID, "kind": 1,
         "start_nanos": 1700000000000001000,
         "end_nanos": 1700000000000001100,
         "dropped_attr": 0, "dropped_events": 0, "dropped_links": 0,
         "trace_state": None, "status_code": 0,
         "status_message": None, "schema_url": None,
         "attrs": [], "events": [], "links": []},
    ]
    attr_t = "struct<key:string,s:string,i:long,d:double,b:boolean>"
    schema = (
        "grp string, span_order int, name string, trace_id_hex "
        "string, span_id_hex string, parent_span_id_hex string, "
        "kind int, start_nanos long, end_nanos long, dropped_attr "
        "long, dropped_events long, dropped_links long, trace_state "
        "string, status_code int, status_message string, schema_url "
        f"string, attrs array<{attr_t}>, events array<struct<"
        f"name:string,ts:long,dropped:long,attrs:array<{attr_t}>>>, "
        "links array<struct<trace_id_hex:string,span_id_hex:string,"
        f"trace_state:string,dropped:long,attrs:array<{attr_t}>>>"
    )
    df = spark.createDataFrame(spans, schema)
    out = ctr_text_blocks(
        df, ["grp"],
        resource_attrs=F.array(
            F.struct(F.lit("host.name").alias("key"),
                     F.lit("web-1").alias("s"),
                     F.lit(None).cast("long").alias("i"),
                     F.lit(None).cast("double").alias("d"),
                     F.lit(None).cast("boolean").alias("b")),
            F.struct(F.lit("pid").alias("key"),
                     F.lit(None).cast("string").alias("s"),
                     F.lit(4242).cast("long").alias("i"),
                     F.lit(None).cast("double").alias("d"),
                     F.lit(None).cast("boolean").alias("b"))),
        scope_name="svc", scope_version="1.2",
        resource_dropped=1,
        resource_schema_url="https://schema/r1",
        scope_dropped=3,
        scope_attrs=F.array(
            F.struct(F.lit("inst").alias("key"),
                     F.lit(None).cast("string").alias("s"),
                     F.lit(None).cast("long").alias("i"),
                     F.lit(None).cast("double").alias("d"),
                     F.lit(True).alias("b"))),
        scope_schema_url="https://schema/s1",
        links_col="links", span_schema_url_col="schema_url",
        events_have_attrs=True,
    )
    [row] = out.collect()
    assert row["text"] == ref


def test_snappy_decompress_reference_blocks():
    """tests/data/snappy_*.bin were produced by compiling the
    reference's vendored snappy (lib/snappy-fef67ac) and compressing
    the matching .raw buffers — the real compressor emits copy
    elements and multi-fragment literals our all-literal encoder
    never produces, so decoding them exercises every element type.
    (Bidirectional interop — the C decompressing our all-literal
    blocks — was verified against the same compiled library across
    40 randomized buffers up to 500 KB when the fixtures were
    generated.)"""
    from fluent_bit_spark.functions.remote_write import (
        snappy_decompress,
    )

    for name in ("snappy_rand", "snappy_text", "snappy_small"):
        raw = _read(f"{name}.raw", "rb")
        comp = _read(f"{name}.bin", "rb")
        assert snappy_decompress(comp) == raw, name
