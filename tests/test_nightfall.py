"""filter_nightfall redaction mechanics
(plugins/filter_nightfall/nightfall.c:397-455)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_bit_spark.operators.nightfall import (
    INT_REDACTION,
    mask_ranges,
    nightfall_redact,
    redact_with_findings,
)


def test_mask_ranges(spark):
    df = spark.createDataFrame(
        [("my ssn is 123-45-6789 ok",)], ["s"]
    ).withColumn(
        "r",
        F.expr("array(array(10L, 21L))"),
    )
    got = df.select(mask_ranges(F.col("s"), F.col("r")).alias("m")).first()["m"]
    assert got == "my ssn is *********** ok"
    # clamping: negative start floored, end past len capped; overlap ok
    df2 = spark.createDataFrame([("abcdef",)], ["s"]).withColumn(
        "r", F.expr("array(array(-2L, 2L), array(4L, 99L), array(1L, 3L))")
    )
    assert df2.select(mask_ranges(F.col("s"), F.col("r")).alias("m")).first()[
        "m"
    ] == "***d**"


def test_redact_with_findings_types(spark):
    df = spark.createDataFrame(
        [("key sk-abc123 here", 4111111111111111, 0),
         ("clean", 42, 1)],
        "msg string, card long, id int",
    ).withColumn(
        "msg__f",
        F.when(F.col("id") == 0, F.expr("array(array(4L, 13L))")).otherwise(
            F.expr("array()").cast("array<array<bigint>>")
        ),
    ).withColumn(
        "card__f",
        F.when(F.col("id") == 0, F.expr("array(array(0L, 16L))")).otherwise(
            F.expr("array()").cast("array<array<bigint>>")
        ),
    )
    out = redact_with_findings(df, {"msg": "msg__f", "card": "card__f"})
    rows = {r["id"]: r for r in out.collect()}
    assert rows[0]["msg"] == "key ********* here"
    # integer fields with findings become the reference's 7-byte
    # "******\0" literal (msgpack_pack_str_with_body len 7 quirk)
    assert rows[0]["card"] == INT_REDACTION
    assert len(INT_REDACTION) == 7
    # untouched record passes through (card stringified by the rewrite)
    assert rows[1]["msg"] == "clean" and rows[1]["card"] == "42"


def test_nightfall_full_pass(spark):
    df = spark.createDataFrame(
        [(1, "email a@b.co and ip 10.1.2.3"), (2, "nothing here")],
        "id int, text string",
    )
    out = nightfall_redact(
        df, ["text"],
        detectors={
            "email": r"[\w.]+@[\w.]+",
            "ipv4": r"\b\d{1,3}(?:\.\d{1,3}){3}\b",
        },
    )
    rows = {r["id"]: r["text"] for r in out.collect()}
    assert rows[1] == "email ****** and ip ********"
    assert rows[2] == "nothing here"
