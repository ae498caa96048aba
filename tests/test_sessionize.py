"""Session windows: gap semantics goldens (boundary at exactly gap,
multi-key isolation, aggregate passthrough)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_bit_spark.operators.sessionize import sessionize


def _ev(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, ts string, value double")
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_session_gap_boundaries(spark):
    df = _ev(
        spark,
        [
            # user 1: events at 0s, 100s, then exactly gap=300s after
            # the second — touching windows MERGE (Spark semantics),
            # then 301s after the third -> NEW session
            (1, "2026-01-01 00:00:00", 1.0),
            (1, "2026-01-01 00:01:40", 2.0),
            (1, "2026-01-01 00:06:40", 4.0),
            (1, "2026-01-01 00:11:41", 8.0),
            # user 2: single event
            (2, "2026-01-01 00:00:00", 16.0),
        ],
    )
    out = sessionize(
        df,
        ["user_id"],
        gap="5 minutes",
        aggs=[F.sum("value").alias("sum_value")],
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    s1 = sorted(by_user[1], key=lambda r: r.session_start)
    assert len(s1) == 2
    # boundary event merged: 3 events in the first session
    assert s1[0].n_events == 3 and s1[0].sum_value == 7.0
    # session end = last event + gap
    assert (s1[0].session_end - s1[0].session_start).total_seconds() == 700
    assert s1[1].n_events == 1 and s1[1].sum_value == 8.0
    assert len(by_user[2]) == 1 and by_user[2][0].n_events == 1


def test_session_within_gap_merges(spark):
    df = _ev(
        spark,
        [
            (1, "2026-01-01 00:00:00", 1.0),
            (1, "2026-01-01 00:04:59", 1.0),  # 1s inside the gap
            (1, "2026-01-01 00:09:58", 1.0),  # chains the session on
        ],
    )
    out = sessionize(df, ["user_id"], gap="5 minutes").collect()
    assert len(out) == 1 and out[0].n_events == 3
