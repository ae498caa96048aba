"""filter_throttle / filter_throttle_size: rate limiting.

Reference: /root/reference/plugins/filter_throttle/throttle.c:100-110
(drop when the sliding per-second average exceeds Rate) and
filter_throttle_size (bytes per key).

The reference's processing-time ticker doesn't translate to a
distributed batch engine; the Spark-shaped equivalent is an
event-time window cap: within each (key, window) at most ``limit``
rows (or bytes) survive, chosen deterministically by row order. This
is a per-window rank filter — one shuffle on (key, window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def throttle(
    df: DataFrame,
    ts_col: str,
    limit: int,
    window_duration: str = "1 second",
    key_cols: list[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Keep at most ``limit`` rows per key per event-time window."""
    parts = [F.window(F.col(ts_col), window_duration)["start"].alias("_win")]
    for k in key_cols or []:
        parts.append(F.col(k))
    w = Window.partitionBy(*parts).orderBy(F.col(order_col or ts_col))
    out = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= limit)
    return out.drop("_rn")


def throttle_size(
    df: DataFrame,
    ts_col: str,
    size_col: str,
    max_bytes: int,
    window_duration: str = "1 second",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Keep rows while the running per-window byte sum stays under
    max_bytes (filter_throttle_size semantics by key)."""
    parts = [F.window(F.col(ts_col), window_duration)["start"].alias("_win")]
    for k in key_cols or []:
        parts.append(F.col(k))
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.col(ts_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("_running", F.sum(F.col(size_col)).over(w))
    return out.filter(F.col("_running") <= max_bytes).drop("_running")
