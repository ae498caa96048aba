"""Tests: salted repartition/aggregate, sysinfo, GELF."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from fluent_bit_spark.functions.gelf import to_gelf
from fluent_bit_spark.operators.sysinfo import sysinfo
from fluent_bit_spark.skew import salted_count_sum, salted_repartition


def test_salted_count_sum_matches_direct(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 3).alias("k"),  # 3 hot keys
        (F.col("id") * 2).alias("v"),
    )
    got = {
        r["k"]: (r["records"], r["total"])
        for r in salted_count_sum(
            df, ["k"], {"total": "v"}, n_salts=8, salt_source="v"
        ).collect()
    }
    want = {
        r["k"]: (r["records"], r["total"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("records"), F.sum("v").alias("total"))
        .collect()
    }
    assert got == want


def test_salted_repartition_spreads_hot_key(spark):
    df = spark.range(0, 4000).select(F.lit("hotdomain").alias("domain"), "id")
    parts = (
        salted_repartition(df, "domain", n_salts=8, stable_cols=["id"], num_partitions=8)
        .withColumn("p", F.spark_partition_id())
        .select("p")
        .distinct()
        .count()
    )
    # one hot key now spans multiple partitions (upper-bounded by the
    # session's 4 shuffle partitions; without salting it would be 1)
    assert parts >= 2


def test_sysinfo_adds_constant_columns(spark):
    df = spark.range(3)
    out = sysinfo(df, version_key="ver", os_name_key="os", hostname_key="hn")
    row = out.first()
    assert row["ver"] == "0.1.0"
    assert row["os"] in ("linux", "darwin", "windows")
    assert isinstance(row["hn"], str) and row["hn"]


def test_gelf_encoding(spark):
    df = spark.createDataFrame(
        [("h1", "boom", 1700000000.5, "error", "web")],
        "host string, msg string, ts double, level string, tag string",
    )
    line = df.select(
        to_gelf(df, "host", "msg", "ts", level_col="level", extra_cols=["tag"]).alias("g")
    ).first()["g"]
    obj = json.loads(line)
    assert obj == {
        "version": "1.1",
        "host": "h1",
        "short_message": "boom",
        "timestamp": 1700000000.5,
        "level": 3,
        "_tag": "web",
    }
