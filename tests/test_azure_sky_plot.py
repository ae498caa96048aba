"""out_azure / out_skywalking / out_plot encodings."""

from __future__ import annotations

import base64
import hashlib
import hmac
import json

import pytest

from pyspark.sql import functions as F

from fluent_bit_spark.functions.azure_out import (
    azure_body,
    azure_headers,
    azure_signature,
    to_azure_record,
)
from fluent_bit_spark.functions.misc_out import (
    to_plot_line,
    to_skywalking_record,
)

TS = "2023-11-14 22:13:20.25"


@pytest.fixture()
def rec_df(spark):
    df = spark.createDataFrame(
        [("app.a", "boot ok", "err", 7, 2.5)],
        "tag string, message string, level string, n long, v double",
    )
    return df.withColumn("ts", F.lit(TS).cast("timestamp"))


def test_azure_record_time_variants(rec_df):
    d = json.loads(rec_df.select(
        to_azure_record(rec_df, "ts").alias("l")).first()["l"])
    assert list(d)[0] == "@timestamp"  # time key prepended
    assert d["@timestamp"] == 1700000000.25  # epoch double default
    assert d["message"] == "boot ok"
    d = json.loads(rec_df.select(
        to_azure_record(rec_df, "ts", time_generated=True).alias("l")
    ).first()["l"])
    assert d["@timestamp"] == "2023-11-14T22:13:20.250Z"  # 3-digit ms
    assert azure_body(['{"a":1}', '{"b":2}']) == '[{"a":1},{"b":2}]'


def test_azure_signature_and_headers():
    key_raw = b"0123456789abcdef"
    key_b64 = base64.b64encode(key_raw).decode()
    date = "Tue, 14 Nov 2023 22:13:20 GMT"
    auth = azure_signature("cust-1", key_b64, 123, date)
    expect = base64.b64encode(hmac.new(
        key_raw,
        (f"POST\n123\napplication/json\nx-ms-date:{date}\n/api/logs"
         ).encode(),
        hashlib.sha256).digest()).decode()
    assert auth == f"SharedKey cust-1:{expect}"
    hdrs = azure_headers("cust-1", key_b64, "x" * 123, date,
                         log_type="applog", time_generated=True)
    assert hdrs["Authorization"] == auth
    assert hdrs["Log-Type"] == "applog"
    assert hdrs["x-ms-date"] == date
    assert hdrs["time-generated-field"] == "@timestamp"
    assert hdrs["User-Agent"] == "Fluent-Bit"


def test_skywalking_record(rec_df):
    d = json.loads(rec_df.select(
        to_skywalking_record(rec_df, "ts").alias("l")).first()["l"])
    # whole-second ms (skywalking.c:126 drops sub-second time)
    assert d["timestamp"] == 1700000000000
    assert d["service"] == "sw-service"
    assert d["serviceInstance"] == "fluent-bit"
    body = json.loads(d["body"]["json"]["json"])
    # only string-valued entries survive into the body (:180-183)
    assert body == {"message": "boot ok", "level": "err"}


def test_plot_line(rec_df):
    line = rec_df.select(
        to_plot_line(rec_df, "ts", key="n").alias("l")).first()["l"]
    assert line == "1700000000.250000 7"
    line = rec_df.select(
        to_plot_line(rec_df, "ts", key="v").alias("l")).first()["l"]
    assert line == "1700000000.250000 2.500000"
    # no key: first record field's value
    df2 = rec_df.select("tag", "n", "ts")
    line = df2.select(to_plot_line(df2, "ts").alias("l")).first()["l"]
    assert line.endswith(" 7")
    with pytest.raises(ValueError, match="unmatched key"):
        to_plot_line(rec_df, "ts", key="missing")


def test_kusto_record(rec_df):
    from fluent_bit_spark.functions.azure_out import to_kusto_record

    d = json.loads(rec_df.select(
        to_kusto_record(rec_df, "ts").alias("l")).first()["l"])
    assert list(d) == ["timestamp", "tag", "log"]
    assert d["timestamp"] == "2023-11-14T22:13:20.250Z"
    assert d["tag"] == "app.a"
    assert d["log"]["message"] == "boot ok" and d["log"]["n"] == 7
    d = json.loads(rec_df.select(to_kusto_record(
        rec_df, "ts", include_time_key=False, include_tag_key=False,
        log_key="l2").alias("l")).first()["l"])
    assert list(d) == ["l2"]
