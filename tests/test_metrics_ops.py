"""Tests: log_to_metrics, snapshot flush, udf hook, sink encoders."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.operators.log_to_metrics import (
    counter_metric,
    gauge_metric,
    histogram_metric,
)
from fluent_bit_spark.operators.snapshot import snapshot_flush
from fluent_bit_spark.operators.udf_hook import apply_hook
from fluent_bit_spark.sinks import csv_line, ltsv_line, template_line, write_per_tag


@pytest.fixture(scope="module")
def recs(spark):
    rows = [
        (0, "web", 10.0, "2026-01-01 00:00:00"),
        (1, "web", 20.0, "2026-01-01 00:00:01"),
        (2, "app", 5.0, "2026-01-01 00:00:02"),
        (3, "web", 90.0, "2026-01-01 00:00:03"),
        (4, "app", 50.0, "2026-01-01 00:00:04"),
    ]
    df = spark.createDataFrame(rows, "id long, tag string, value double, t string")
    return df.withColumn("event_time", F.to_timestamp("t")).drop("t")


def test_counter_and_gauge(recs):
    c = {r["tag"]: r["value"] for r in counter_metric(recs, ["tag"]).collect()}
    assert c == {"web": 3.0, "app": 2.0}
    csum = {
        r["tag"]: r["value"]
        for r in counter_metric(recs, ["tag"], value_col="value").collect()
    }
    assert csum == {"web": 120.0, "app": 55.0}
    g = {
        r["tag"]: r["value"]
        for r in gauge_metric(recs, ["tag"], "value", order_col="id").collect()
    }
    assert g == {"web": 90.0, "app": 50.0}  # last by id


def test_histogram_cumulative(recs):
    h = histogram_metric(recs, ["tag"], "value", buckets=[10, 50])
    rows = {(r["tag"], r["le"]): r for r in h.collect()}
    assert rows[("web", "10")]["bucket_count"] == 1   # 10.0
    assert rows[("web", "50")]["bucket_count"] == 2   # 10, 20
    assert rows[("web", "+Inf")]["bucket_count"] == 3
    assert rows[("web", "10")]["metric_sum"] == 120.0
    assert rows[("app", "50")]["bucket_count"] == 2   # 5, 50 (le)


def test_snapshot_flush_rows_mode(recs):
    out = snapshot_flush(
        recs,
        F.col("value") >= 50,
        ts_col="event_time",
        limit=2,
        id_col="id",
    )
    got = sorted((r["trigger_id"], r["id"]) for r in out.collect())
    # triggers: id=3 (90.0) and id=4 (50.0); last-2 records each
    assert got == [(3, 2), (3, 3), (4, 3), (4, 4)]


def test_snapshot_flush_seconds_mode(recs):
    out = snapshot_flush(
        recs, F.col("value") >= 90, ts_col="event_time", seconds=2.5
    )
    ids = sorted(r["id"] for r in out.collect())
    assert ids == [1, 2, 3]  # within 2.5s before trigger id=3


def test_udf_hook_codes(recs):
    def fn(tag, ts, record):
        v = record["value"]
        if v < 10:
            return -1, ts, None  # drop
        if v < 50:
            return 0, ts, None  # keep unchanged
        if v < 90:
            return 2, ts + 1000, {"doubled": v * 2}  # modify, keep ts
        return 1, ts + 60, [{"part": 1}, {"part": 2}]  # 1->N with new ts

    out = apply_hook(recs, fn, ts_col="event_time")
    rows = [(r["tag"], r["ts"], json.loads(r["record"])) for r in out.collect()]
    assert len(rows) == 5  # 5 in: 1 dropped, 2 kept, 1 modified, 1->2
    vals = sorted(json.dumps(r[2], sort_keys=True) for r in rows)
    assert json.dumps({"doubled": 100.0}, sort_keys=True) in vals
    assert sum(1 for r in rows if r[2].get("part")) == 2
    # code 2 keeps original timestamp
    kept_ts = [r[1] for r in rows if r[2].get("doubled")]
    orig = recs.filter("id = 4").select(F.col("event_time").cast("double")).first()[0]
    assert kept_ts == [orig]


def test_sink_encoders(recs, tmp_path):
    df = recs.select("id", "tag", "value")
    lines = df.select(
        csv_line(df, ["id", "tag", "value"]).alias("csv"),
        ltsv_line(df, ["id", "value"]).alias("ltsv"),
        template_line(df, "v={value} t={tag} missing={nope}").alias("tpl"),
    ).collect()
    # msgpack_object_print parity (objectc.c:144-188): strings quoted,
    # floats %f with 6 decimals
    first = [r for r in lines if r["csv"].startswith("0,")][0]
    assert first["csv"] == '0,"web",10.000000'
    assert first["ltsv"] == '"id":0\t"value":10.000000'
    assert first["tpl"] == "v=10.0 t=web missing={nope}"

    # time field + nil parity (file.c:184-185 csv sec.nanos prefix,
    # file.c:208-211 ltsv "time":<double> lead)
    spark0 = df.sparkSession
    tdf = spark0.createDataFrame(
        [(1, "a,b", None, 1.5)],
        "id long, txt string, missing string, event_time double",
    ).withColumn("event_time", F.timestamp_seconds("event_time"))
    trow = tdf.select(
        csv_line(tdf, ts_col="event_time").alias("csv"),
        ltsv_line(tdf, ts_col="event_time").alias("ltsv"),
    ).first()
    assert trow["csv"] == '1.500000000,1,"a,b",nil'
    assert trow["ltsv"] == '"time":1.500000\t"id":1\t"txt":"a,b"\t"missing":nil'

    out = str(tmp_path / "pertag")
    write_per_tag(df.withColumn("event_time", F.lit(0.0)), out, fmt="json_lines", ts_col="event_time")
    spark = df.sparkSession
    back = spark.read.text(os.path.join(out, "tag=web"))
    assert back.count() == 3
    payload = json.loads(back.first()["value"])
    assert set(payload) >= {"date", "id", "value"}
