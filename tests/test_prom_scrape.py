"""Prometheus exposition-text parsing (in_prometheus_scrape side)."""

from __future__ import annotations

import math

from fluent_bit_spark.sources.prom_scrape import parse_prometheus_text

DOC = """\
# HELP http_requests_total Total requests.
# TYPE http_requests_total counter
http_requests_total{method="get",code="200"} 1027 1700000000123
http_requests_total{method="post",code="200"} 3
# TYPE rq_duration histogram
rq_duration_bucket{le="0.1"} 5
rq_duration_bucket{le="+Inf"} 9
rq_duration_sum 2.5
rq_duration_count 9
# a free comment
up 1
weird{path="a\\\\b",msg="say \\"hi\\"\\nbye"} NaN
empty_inf -Inf
"""


def _parse(spark):
    df = spark.createDataFrame(
        [(ln,) for ln in DOC.splitlines()], ["line"])
    return {(r["name"], tuple(sorted((r["labels"] or {}).items()))): r
            for r in parse_prometheus_text(df).collect()}


def test_samples_and_annotations(spark):
    rows = _parse(spark)
    r = rows[("http_requests_total",
              (("code", "200"), ("method", "get")))]
    assert r["value"] == 1027.0
    assert r["ts_ms"] == 1700000000123
    assert r["mtype"] == "counter"
    assert r["help"] == "Total requests."
    # no timestamp -> NULL
    r2 = rows[("http_requests_total",
               (("code", "200"), ("method", "post")))]
    assert r2["ts_ms"] is None and r2["value"] == 3.0


def test_histogram_suffix_attachment(spark):
    rows = _parse(spark)
    assert rows[("rq_duration_bucket", (("le", "0.1"),))]["mtype"] == \
        "histogram"
    assert rows[("rq_duration_sum", ())]["mtype"] == "histogram"
    assert rows[("rq_duration_count", ())]["mtype"] == "histogram"
    inf_b = rows[("rq_duration_bucket", (("le", "+Inf"),))]
    assert inf_b["value"] == 9.0


def test_untyped_nan_inf_and_escapes(spark):
    rows = _parse(spark)
    assert rows[("up", ())]["mtype"] is None  # no TYPE line
    w = rows[("weird", (("msg", 'say "hi"\nbye'), ("path", "a\\b")))]
    assert math.isnan(w["value"])
    assert rows[("empty_inf", ())]["value"] == float("-inf")
    # comment lines produce no sample rows
    assert len(rows) == 9
