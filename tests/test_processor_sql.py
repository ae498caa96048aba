"""processor_sql: reduced surface (projection+filter, no aggregates)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.operators.processor_sql import processor_sql


@pytest.fixture(scope="module")
def recs(spark):
    df = spark.createDataFrame(
        [(1, "web", 10.0), (2, "web", 90.0), (3, "app", 50.0)],
        "id long, tag string, value double",
    )
    return df.withColumn("event_time", F.to_timestamp(F.lit("2026-01-01 00:00:00")))


def test_projection_and_filter(recs):
    out = processor_sql(
        recs, "SELECT id AS rid, value FROM STREAM:s WHERE value >= 50;"
    )
    rows = sorted((r["rid"], r["value"]) for r in out.collect())
    assert rows == [(2, 90.0), (3, 50.0)]


def test_rejects_aggregates_windows_groupby(recs):
    with pytest.raises(ValueError, match="no aggregates"):
        processor_sql(recs, "SELECT COUNT(*) FROM STREAM:s;")
    with pytest.raises(ValueError, match="no windows"):
        processor_sql(
            recs, "SELECT id FROM STREAM:s WINDOW TUMBLING (1 SECOND);"
        )
