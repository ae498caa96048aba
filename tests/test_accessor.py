"""Record-accessor path/template tests (ra.y / flb_ra_translate)."""

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.functions.accessor import ra_col, ra_translate_col


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (
                "web.en.com",
                "hello",
                {"sub1": {"sub2": "blue"}},
                ["x", "y", "z"],
            )
        ],
        "tag string, msg string, map struct<sub1: struct<sub2: string>>, arr array<string>",
    )


def test_plain_key(df):
    assert df.select(ra_col("$msg").alias("v")).collect()[0]["v"] == "hello"


def test_nested_subkeys(df):
    assert df.select(ra_col("$map['sub1']['sub2']").alias("v")).collect()[0]["v"] == "blue"


def test_array_index(df):
    assert df.select(ra_col("$arr[1]").alias("v")).collect()[0]["v"] == "y"


def test_tag_and_tag_part(df):
    row = df.select(
        ra_col("$TAG").alias("t"), ra_col("$TAG[1]").alias("p")
    ).collect()[0]
    assert row["t"] == "web.en.com"
    assert row["p"] == "en"  # $TAG[n]: n-th dot-separated part


def test_template_translate(df):
    col = ra_translate_col("errors.$TAG[1].$msg")
    assert df.select(col.alias("v")).collect()[0]["v"] == "errors.en.hello"


def test_template_with_captures(df):
    col = ra_translate_col("x.$0.y", captures={0: F.lit("CAP")})
    assert df.select(col.alias("v")).collect()[0]["v"] == "x.CAP.y"


def test_template_null_renders_empty(spark):
    df2 = spark.createDataFrame([(None, "t.a")], "msg string, tag string")
    col = ra_translate_col("pre.$msg.post")
    assert df2.select(col.alias("v")).collect()[0]["v"] == "pre..post"


def test_bad_accessor_raises():
    with pytest.raises(ValueError):
        ra_col("$bad[")


def test_env_var_interpolation(spark, monkeypatch):
    # ${ENV} resolves at compile time (flb_record_accessor.c:291-313);
    # unset vars render empty
    from fluent_bit_spark.functions.accessor import ra_translate_col

    monkeypatch.setenv("FLB_TEST_ZONE", "us-east")
    df = spark.createDataFrame([("app.log", "x")], "tag string, k string")
    out = df.select(
        ra_translate_col("${FLB_TEST_ZONE}.$TAG[0].$k.${FLB_UNSET_VAR}!").alias("t")
    ).collect()
    assert out[0]["t"] == "us-east.app.x.!"
