"""cmetrics debug-text encoding, columnar.

Reference: /root/reference/lib/cmetrics/src/cmt_encode_text.c — the
format ``out_stdout`` (and the engine's debug dumps) prints for
METRICS-type events::

    2023-11-14T22:13:20.000000123Z fqname{app="api",host="h1"} = 1.5

One line per sample, RFC3339Nano UTC timestamp with exactly nine
nanosecond digits (format_metric :188-199), static labels first then
per-sample labels in one ``{k="v",...}`` group (:202-258, raw cat —
the text encoder does NO label escaping), then the value:

- scalar kinds: `` = %.17g`` (append_metric_value :164-166);
- histogram (append_histogram_metric_value :32-95):
  `` = { buckets = { <%g bound>=<count>, ..., +Inf=<count> }, sum=<%g>, count=<u64> }``
  with RAW per-bucket counts (not cumulative);
- summary (append_summary_metric_value :97-145):
  `` = { quantiles = { <%g q>=<%g v>, ... }, sum=<%g>, count=<u64> }``.

Input rows use the parse_otlp_metrics_df long-row model shared with
cmt_influx_lines / cmt_splunk_hec_events / cmt_emf_events: ``name``
is the cmetrics fqname, ``tags`` an array<struct<key,value>>,
``bucket_counts`` has len(explicit_bounds)+1 entries (the +Inf
bucket last).  The whole encoder is one Catalyst projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .influx_out import _render_g
from .prom_out import _render_value


def _ts_rfc3339nano() -> Column:
    """cmt_time_from_ns + gmtime + ``%Y-%m-%dT%H:%M:%S.%09luZ`` over
    the ``ts`` column (format_metric :188-199).  Integer division
    (`div`) keeps ts > 2^53 exact — a double detour would round the
    seconds at the truncation boundary (the hec_out precedent); the
    session timezone is UTC so date_format is gmtime."""
    sec = F.expr("ts div 1000000000")
    nsec = (F.col("ts") % F.lit(1_000_000_000)).cast("long")
    return F.concat(
        F.date_format(F.timestamp_seconds(sec), "yyyy-MM-dd'T'HH:mm:ss."),
        F.lpad(nsec.cast("string"), 9, "0"),
        F.lit("Z "),
    )


def cmt_text_lines(
    df: DataFrame,
    static_labels: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """cmetrics -> debug text lines (cmt_encode_text_create), one
    ``line`` per sample row.  Label group semantics kept from the C
    (format_metric :202-258): ``{`` opens with the first static
    label, per-sample labels join the SAME group after a comma, and
    the group closes only when at least one label of either kind
    exists; keys and values are concatenated raw (no escaping)."""
    tags_col = F.col("tags") if "tags" in df.columns else F.array()
    static = static_labels or []
    static_str = ",".join(f'{k}="{v}"' for k, v in static)

    tag_str = F.array_join(
        F.transform(
            tags_col,
            lambda t: F.concat(
                t["key"], F.lit('="'), t["value"], F.lit('"')
            ),
        ),
        ",",
    )
    has_tags = F.size(tags_col) > 0
    if static:
        label_group = F.concat(
            F.lit("{" + static_str),
            F.when(has_tags, F.concat(F.lit(","), tag_str))
            .otherwise(F.lit("")),
            F.lit("}"),
        )
    else:
        label_group = F.when(
            has_tags, F.concat(F.lit("{"), tag_str, F.lit("}"))
        ).otherwise(F.lit(""))

    bounds = F.col("explicit_bounds")
    counts = F.col("bucket_counts")
    n_bounds = F.size(bounds)
    finite = F.zip_with(
        bounds,
        F.slice(counts, 1, F.greatest(n_bounds, F.lit(1))),
        lambda b, c: F.concat(_render_g(b), F.lit("="),
                              c.cast("string")),
    )
    hist_val = F.concat(
        F.lit(" = { buckets = { "),
        F.when(
            n_bounds > 0,
            F.concat(F.array_join(finite, ", "), F.lit(", ")),
        ).otherwise(F.lit("")),
        F.lit("+Inf="),
        F.element_at(counts, -1).cast("string"),
        F.lit(" }, sum="),
        _render_g(F.col("hist_sum")),
        F.lit(", count="),
        F.col("hist_count").cast("string"),
        F.lit(" }"),
    )
    empty_d = F.array().cast("array<double>")
    q_pairs = F.zip_with(
        F.coalesce(F.col("quantiles"), empty_d),
        F.coalesce(F.col("quantile_values"), empty_d),
        lambda q, v: F.concat(_render_g(q), F.lit("="), _render_g(v)),
    )
    # zero quantiles: the C loop body never runs, leaving exactly one
    # space between the braces (append_summary_metric_value :107,128)
    summ_val = F.concat(
        F.lit(" = { quantiles = { "),
        F.when(
            F.size(q_pairs) > 0,
            F.concat(F.array_join(q_pairs, ", "), F.lit(" ")),
        ).otherwise(F.lit("")),
        F.lit("}, sum="),
        _render_g(F.col("sum_sum")),
        F.lit(", count="),
        F.col("sum_count").cast("string"),
        F.lit(" }"),
    )
    scalar_val = F.concat(F.lit(" = "), _render_value(F.col("value")))

    value = (
        F.when(F.col("mtype") == "histogram", hist_val)
        .when(F.col("mtype") == "summary", summ_val)
        .otherwise(scalar_val)
    )
    line = F.concat(
        _ts_rfc3339nano(),
        F.col("name"),
        label_group,
        value,
    )
    return df.withColumn("line", line)
