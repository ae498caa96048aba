"""out_prometheus_exporter: exposition-text encoding of metric rows.

Reference: /root/reference/plugins/out_prometheus_exporter (serves the
cmetrics context over HTTP) with the text format produced by
lib/cmetrics/src/cmt_encode_prometheus.c: per metric a ``# HELP`` and
``# TYPE`` header then one sample line per label set::

    name{l1="v1",l2="v2"} value [timestamp_ms]

Label values escape backslash, double quote and newline
(cmt_encode_prometheus.c append_string_value); a metric with no
labels omits the braces; histogram family emits _bucket{le=...},
_sum and _count series (already flattened by
operators/log_to_metrics.histogram_metric).

Value rendering: integral values print as integers, non-integral via
the shortest round-trip double string (cmetrics prints %.17g and
strips; identical for every value whose decimal form needs <= 17
significant digits).

The encoder is a Catalyst projection per metric row; headers are two
constant rows unioned in front (sort by the ``ord`` column to keep
the exposition order when writing single-file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _esc(col):
    out = F.regexp_replace(col.cast("string"), r"\\", r"\\\\")
    out = F.regexp_replace(out, "\n", r"\\n")
    return F.regexp_replace(out, '"', '\\\\"')


def _render_value(col):
    d = col.cast("double")
    return F.when(
        (d == F.floor(d).cast("double")) & (F.abs(d) < 1e15),
        d.cast("long").cast("string"),
    ).otherwise(d.cast("string"))


def prometheus_text(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    mtype: str,
    help_text: str,
    label_cols: list[str],
    value_col: str = "value",
    suffix_col: str | None = None,
    ts_ms_col: str | None = None,
    static_labels: list[tuple[str, str]] | None = None,
    lead_label: tuple[str, str] | None = None,
) -> DataFrame:
    """(ord, line) rows: 2 header lines then one sample per metric
    row. ``suffix_col`` appends a per-row series suffix (histogram
    _bucket/_sum/_count splits); ``ts_ms_col`` appends the optional
    millisecond timestamp. Label-group order follows the C
    (cmt_encode_prometheus.c format_metric): the ``lead_label``
    (le / quantile, a (name, column) pair — skipped on rows where
    the column is null) first, then ``static_labels`` (cmt_label_add
    config constants), then per-row ``label_cols`` — a NULL label
    column is OMITTED from the group (the static sample prints only
    the static labels), and the braces disappear entirely when no
    label of any kind renders."""
    if mtype not in ("counter", "gauge", "histogram", "summary", "untyped"):
        raise ValueError(f"invalid metric type {mtype!r}")
    headers = spark.createDataFrame(
        [(0, f"# HELP {name} {help_text}"), (1, f"# TYPE {name} {mtype}")],
        "ord long, line string",
    )
    series = F.lit(name)
    if suffix_col:
        series = F.concat(series, F.col(suffix_col))
    pair_exprs = []
    if lead_label is not None:
        lk, lc = lead_label
        col = F.col(lc)
        pair_exprs.append(F.when(col.isNotNull(), F.concat(
            F.lit(f'{lk}="'), _esc(col), F.lit('"'))))
    for k, v in (static_labels or []):
        pair_exprs.append(F.lit(f'{k}="{v}"'))  # config constants
    for c in label_cols:
        col = F.col(c)
        pair_exprs.append(F.when(col.isNotNull(), F.concat(
            F.lit(f'{c}="'), _esc(col), F.lit('"'))))
    if pair_exprs:
        arr = F.array_compact(F.array(*pair_exprs))
        labels = F.when(
            F.size(arr) > 0,
            F.concat(F.lit("{"), F.array_join(arr, ","), F.lit("}")),
        ).otherwise(F.lit(""))
    else:
        labels = F.lit("")
    line = F.concat(series, labels, F.lit(" "), _render_value(F.col(value_col)))
    if ts_ms_col:
        line = F.concat(line, F.lit(" "), F.col(ts_ms_col).cast("string"))
    return headers.unionByName(
        df.select(F.lit(2).cast("long").alias("ord"), line.alias("line"))
    )
