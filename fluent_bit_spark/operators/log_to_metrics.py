"""filter_log_to_metrics: derive counter/gauge/histogram metrics from
matching records.

Reference: /root/reference/plugins/filter_log_to_metrics/
log_to_metrics.h:36-44 (modes COUNTER, GAUGE, HISTOGRAM), :62-90
(config: value_field, label_field, buckets), log_to_metrics.c:805
(callback), :904/:936/:976 (cmt counter/gauge/histogram updates).

Spark shapes (one shuffle each, keyed on the label set):
- counter:   groupBy(labels).count()  (or sum(value_field) in
             increment mode, log_to_metrics.c:918-934)
- gauge:     last observed value per label set (deterministic: max
             by an explicit order column, the reference takes the
             latest record in arrival order)
- histogram: fixed bucket upper bounds; per (labels, bucket) count,
             cumulative like Prometheus (le semantics), plus +Inf,
             sum and count rows — log_to_metrics.c:976-1010.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKETS = [0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1, 2.5, 5, 10]


def _base(df: DataFrame, match: Column | None) -> DataFrame:
    return df.filter(match) if match is not None else df


def counter_metric(
    df: DataFrame,
    label_cols: list[str],
    match: Column | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """COUNTER mode: count matching records per label set; with
    value_col, sum it instead (increment mode)."""
    g = _base(df, match).groupBy(*label_cols)
    if value_col:
        return g.agg(F.sum(F.col(value_col).cast("double")).alias("value"))
    return g.agg(F.count(F.lit(1)).cast("double").alias("value"))


def gauge_metric(
    df: DataFrame,
    label_cols: list[str],
    value_col: str,
    order_col: str,
    match: Column | None = None,
) -> DataFrame:
    """GAUGE mode: the value of the LAST matching record per label set
    (order made explicit via order_col — at 10^12 rows 'arrival order'
    must be a column, not partition luck)."""
    w = Window.partitionBy(*label_cols).orderBy(F.col(order_col).desc())
    return (
        _base(df, match)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*label_cols, F.col(value_col).cast("double").alias("value"))
    )


def histogram_metric(
    df: DataFrame,
    label_cols: list[str],
    value_col: str,
    buckets: list[float] | None = None,
    match: Column | None = None,
) -> DataFrame:
    """HISTOGRAM mode: cumulative Prometheus-style buckets.

    Output rows per label set: one row per bucket upper bound ('le'
    as string, cumulative count), one '+Inf' row, plus metric_sum /
    metric_count columns replicated on each row (flat, SQL-friendly).
    """
    bs = sorted(buckets or DEFAULT_BUCKETS)
    src = _base(df, match)
    v = F.col(value_col).cast("double")
    per_label = src.groupBy(*label_cols).agg(
        F.sum(v).alias("metric_sum"),
        F.count(F.lit(1)).alias("metric_count"),
        *[
            F.sum(F.when(v <= b, 1).otherwise(0)).alias(f"_b{i}")
            for i, b in enumerate(bs)
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(str(b)).alias("le"), F.col(f"_b{i}").alias("bucket_count")
            )
            for i, b in enumerate(bs)
        ],
        F.struct(F.lit("+Inf").alias("le"), F.col("metric_count").alias("bucket_count")),
    )
    return (
        per_label.withColumn("_rows", rows)
        .select(
            *label_cols,
            F.explode("_rows").alias("b"),
            "metric_sum",
            "metric_count",
        )
        .select(
            *label_cols,
            F.col("b.le").alias("le"),
            F.col("b.bucket_count").alias("bucket_count"),
            "metric_sum",
            "metric_count",
        )
    )
