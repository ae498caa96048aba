"""Invalid-query rejection, ported from the reference's
tests/internal/include/sp_invalid_queries.h (all 8 must error)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.sp.translate import run_query

INVALID = [
    "SELECT id, MIN(id) FROM STREAM:FLB;",
    "SELECT *, COUNT(id) FROM STREAM:FLB;",
    "SELECT * FROM TAG:FLB WHERE bool = NULL ;",
    "SELECT * FROM TAG:FLB WHERE @record.some_random_func() ;",
    "SELECT id, MIN(id) FROM STREAM:FLB WINDOW TUMBLING (1 SECOND) GROUP BY bool;",
    "SELECT *, COUNT(id) FROM STREAM:FLB WINDOW TUMBLING (1 SECOND) GROUP BY bool;",
    "SELECT *, COUNT(bool) FROM STREAM:FLB WINDOW TUMBLING (1 SECOND) GROUP BY bool;",
    "SELECT *, bool, COUNT(bool) FROM STREAM:FLB WINDOW TUMBLING (1 SECOND) GROUP BY bool;",
]


@pytest.fixture(scope="module")
def df(spark):
    d = spark.createDataFrame([(1, True, 10.0)], "id long, bool boolean, bytes double")
    return d.withColumn("event_time", F.to_timestamp(F.lit("2026-01-01 00:00:00")))


@pytest.mark.parametrize("sql", INVALID)
def test_invalid_query_rejected(df, sql):
    with pytest.raises((ValueError, SyntaxError)):
        run_query(sql, df)
