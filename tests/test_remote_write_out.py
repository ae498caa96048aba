"""out_prometheus_remote_write encoder twin — unit goldens for the
cmt_encode_prometheus_remote_write.c quirks the driver gate cannot
isolate (static-first walk, stale-static short-circuit, abort-keep,
series merge on repeated label sets, zero metadata)."""

from fluent_bit_spark.functions.remote_write import (
    decode_write_request,
)
from fluent_bit_spark.functions.remote_write_out import (
    build_write_request,
    fmt_17g,
)

NOW = 1_700_000_000_000_000_000
FRESH = NOW - 1_000_000_000
STALE = NOW - 7_200_000_000_000  # 2h old
FUTURE = NOW + 7_200_000_000_000  # uint64 underflow -> stale


def _counter(name, labels, ts, value):
    return {"mtype": "counter", "name": name, "labels": labels,
            "ts": ts, "value": value}


def _series(buf):
    return decode_write_request(buf)


def test_basic_series_shape_and_label_order():
    buf = build_write_request(
        [_counter("req", {"path": "/a"}, FRESH, 2.0)],
        static_labels=[("job", "fb")], now_ns=NOW)
    [(labels, samples)] = _series(buf)
    # dict preserves insertion order: __name__, static, then keys
    assert list(labels.items()) == [
        ("__name__", "req"), ("job", "fb"), ("path", "/a")]
    assert samples == [(2.0, FRESH // 1_000_000)]


def test_repeated_label_set_merges_samples_into_one_series():
    buf = build_write_request([
        _counter("req", {"p": "x"}, FRESH, 1.0),
        _counter("req", {"p": "x"}, FRESH + 1_000_000, 2.0),
        _counter("req", {"p": "y"}, FRESH, 3.0),
    ], now_ns=NOW)
    out = _series(buf)
    assert len(out) == 2
    assert [len(s) for _, s in out] == [2, 1]


def test_basic_family_aborts_at_first_stale_keeping_packed():
    buf = build_write_request([
        _counter("req", {"p": "a"}, FRESH, 1.0),
        _counter("req", {"p": "b"}, STALE, 2.0),
        _counter("req", {"p": "c"}, FRESH, 3.0),  # dropped: after abort
    ], now_ns=NOW)
    out = _series(buf)
    assert [lbl["p"] for lbl, _ in out] == ["a"]


def test_future_timestamp_is_stale_via_uint64_underflow():
    buf = build_write_request(
        [_counter("req", {"p": "a"}, FUTURE, 1.0)], now_ns=NOW)
    assert _series(buf) == []


def test_static_metric_walks_first():
    buf = build_write_request([
        _counter("req", {"p": "a"}, FRESH, 1.0),
        _counter("req", {}, FRESH, 9.0),  # static: no labels
    ], now_ns=NOW)
    out = _series(buf)
    assert [list(lbl.values()) for lbl, _ in out] == [
        ["req"], ["req", "a"]]
    assert out[0][1] == [(9.0, FRESH // 1_000_000)]


def test_stale_static_short_circuits_complex_family():
    hist = {"mtype": "histogram", "name": "lat", "labels": {},
            "ts": STALE, "value": None,
            "bucket_counts": [1, 2, 3], "explicit_bounds": [0.5, 2.0],
            "hist_sum": 1.0, "hist_count": 6}
    labeled = dict(hist, labels={"s": "x"}, ts=FRESH)
    assert _series(build_write_request([hist, labeled], now_ns=NOW)) == []


def test_complex_family_skips_stale_metrics_individually():
    mk = lambda lbl, ts: {
        "mtype": "histogram", "name": "lat", "labels": {"s": lbl},
        "ts": ts, "value": None, "bucket_counts": [1, 2, 3],
        "explicit_bounds": [0.5, 2.0], "hist_sum": 4.5,
        "hist_count": 6}
    out = _series(build_write_request(
        [mk("a", FRESH), mk("b", STALE), mk("c", FRESH)], now_ns=NOW))
    names = {lbl["__name__"] for lbl, _ in out}
    assert names == {"lat_count", "lat_sum", "lat_bucket"}
    shards = {lbl.get("s") for lbl, _ in out}
    assert shards == {"a", "c"}


def test_histogram_buckets_raw_counts_and_17g_captions():
    hist = {"mtype": "histogram", "name": "lat",
            "labels": {"s": "x"}, "ts": FRESH, "value": None,
            "bucket_counts": [5, 7, 11],
            "explicit_bounds": [0.25, 0.99],
            "hist_sum": 9.5, "hist_count": 23}
    out = _series(build_write_request([hist], now_ns=NOW))
    by_le = {lbl.get("le"): s[0][0] for lbl, s in out
             if lbl["__name__"] == "lat_bucket"}
    # stored bucket cells pass through verbatim (hist_get_value :170;
    # cmetrics keeps them cumulative at observe time)
    assert by_le == {"0.25": 5.0, "0.98999999999999999": 7.0,
                     "+Inf": 11.0}
    flat = {lbl["__name__"]: s[0][0] for lbl, s in out
            if "le" not in lbl}
    assert flat == {"lat_count": 23.0, "lat_sum": 9.5}


def test_summary_quantile_series():
    summ = {"mtype": "summary", "name": "rt", "labels": {"a": "1"},
            "ts": FRESH, "value": None,
            "quantiles": [0.5, 0.99], "quantile_values": [1.5, 4.5],
            "sum_sum": 6.0, "sum_count": 2}
    out = _series(build_write_request([summ], now_ns=NOW))
    qs = {lbl.get("quantile"): s[0][0] for lbl, s in out
          if lbl["__name__"] == "rt"}
    assert qs == {"0.5": 1.5, "0.98999999999999999": 4.5}


def test_no_metadata_field_in_write_request():
    # ADD_METADATA is CMT_FALSE (header :27): only field 1 present
    buf = build_write_request(
        [_counter("req", {"p": "a"}, FRESH, 1.0)], now_ns=NOW)
    fields = set()
    pos = 0
    while pos < len(buf):
        tag = buf[pos]
        fields.add(tag >> 3)
        ln = buf[pos + 1]
        pos += 2 + ln  # all payloads here are < 128 bytes
    assert fields == {1}


def test_fmt_17g():
    assert fmt_17g(2.0) == "2"
    assert fmt_17g(0.5) == "0.5"
    assert fmt_17g(0.99) == "0.98999999999999999"


def test_family_walk_order_counters_before_histograms():
    hist = {"mtype": "histogram", "name": "a_lat",
            "labels": {"s": "x"}, "ts": FRESH, "value": None,
            "bucket_counts": [1, 2], "explicit_bounds": [1.0],
            "hist_sum": 1.0, "hist_count": 3}
    out = _series(build_write_request(
        [hist, _counter("z_req", {"p": "a"}, FRESH, 1.0)], now_ns=NOW))
    # counter family packs first despite sorting after by name
    assert out[0][0]["__name__"] == "z_req"


def test_spark_export_round_trip(spark):
    from pyspark.sql import functions as F

    from fluent_bit_spark.functions.remote_write import (
        decode_remote_write,
    )
    from fluent_bit_spark.functions.remote_write_out import (
        remote_write_export,
    )

    rows = spark.range(20).select(
        F.lit("k").alias("chunk"),
        F.lit("counter").alias("mtype"), F.lit("c").alias("name"),
        F.concat(F.lit('{"i":"'), (F.col("id") % 3).cast("string"),
                 F.lit('"}')).alias("labels"),
        (F.lit(FRESH) + F.col("id")).alias("ts"),
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
    bodies = remote_write_export(rows, "chunk", now_ns=NOW)
    got = decode_remote_write(
        bodies.select(F.col("body").alias("data"))).collect()
    assert len(got) == 20
    assert {r["name"] for r in got} == {"c"}
    assert sorted(r["value"] for r in got) == [float(i) for i in range(20)]
