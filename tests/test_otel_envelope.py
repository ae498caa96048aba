"""processor_opentelemetry_envelope (otel_envelope.c) semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.operators.otel_envelope import (
    otel_envelope_cols,
    otel_envelope_rows,
)


def _logs(spark):
    return spark.createDataFrame(
        [("app.a", 1, "x"), ("app.a", 2, "y"), ("app.b", 3, "z")],
        "tag string, rid long, msg string",
    )


def test_cols_form(spark):
    out = otel_envelope_cols(_logs(spark))
    row = out.first()
    assert row.otel_schema == "otlp"
    assert row.resource_id == 0 and row.scope_id == 0
    assert row.resource == {} and row.scope == {}
    # narrow: no exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_rows_form_layout(spark):
    out = otel_envelope_rows(_logs(spark), ["tag"])
    rows = sorted(out.collect(), key=lambda r: (r.tag, r.seq, r.rid or 0))
    # per group: start, payload..., end — like envelop_init/envelop_end
    a = [r for r in rows if r.tag == "app.a"]
    assert [r.record_type for r in a] == ["group_start", "normal", "normal", "group_end"]
    assert a[0].otel_schema == "otlp" and a[0].resource_id == 0 and a[0].scope_id == 0
    assert a[0].rid is None and a[0].msg is None
    assert [r.rid for r in a[1:3]] == [1, 2]
    assert a[3].otel_schema is None
    b = [r for r in rows if r.tag == "app.b"]
    assert [r.record_type for r in b] == ["group_start", "normal", "group_end"]


def test_rows_form_rejects_collisions(spark):
    df = _logs(spark).withColumn("seq", F.lit(9))
    with pytest.raises(ValueError):
        otel_envelope_rows(df, ["tag"])
