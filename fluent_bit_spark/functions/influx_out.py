"""out_influxdb line-protocol encoding, columnar.

Reference: /root/reference/plugins/out_influxdb/influxdb.c
(``influxdb_format`` :61-290, ``is_tagged_key`` via Tag_Keys /
Auto_Tags config :640-690) and influxdb_bulk.c (``influxdb_escape``
:31, kv/timestamp append :96-210). Per record the reference emits::

    <tag>[,<seq_name>=<seq>][,tagk=tagv...] fieldk=fieldv[,...] <ns>

* measurement = the fluent-bit tag; an optional sequence tag
  (``sequence_tag``, default ``_seq``) disambiguates identical
  timestamps; record keys listed in ``tag_keys`` (or every string
  value under ``auto_tags``) go into the tag set, everything else into
  the field set.
* escaping (influxdb_bulk.c:31-44): keys and tag values escape
  whitespace, ``,`` and ``=``; a backslash is always doubled; string
  FIELD values are first JSON-escaped (flb_utils_write_str_buf) then
  wrapped in double quotes with ``"`` and ``\\`` escaped — the
  double-escaping of backslashes is reference behavior and kept.
* value rendering (influxdb.c:160-210): bool -> TRUE/FALSE unquoted,
  ints bare (``use_influxdb_integer`` appends ``i``), floats
  printf-%f, NULL values skipped entirely.
* timestamp: nanoseconds (influxdb_bulk.c:187-210); the reference
  bumps duplicated consecutive timestamps by 1 ns (influxdb_tsmod,
  influxdb.c:44-55) — a sequential-state quirk re-expressed here as a
  deterministic per-(measurement, ts) row_number offset, which is the
  order-independent (and therefore distributed-safe) equivalent.

The whole encoder is one Catalyst projection (WholeStageCodegen); the
sequence/dedup pass is a single window over (measurement, ts) and is
only added when requested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# isspace() chars, ',' and '=' get a backslash; '\' is doubled
_KEY_ESC = r"([\s,=\\])"
# string field values: '"' and '\' get a backslash (after JSON escape)
_QUOTE_ESC = r'(["\\])'


def _esc_key(col: Column) -> Column:
    """influxdb_escape(quote=false): backslash before whitespace, ','
    '=' and '\\' (influxdb_bulk.c:31-44)."""
    return F.regexp_replace(col, _KEY_ESC, r"\\$1")


def _json_escape(col: Column) -> Column:
    """flb_utils_write_str-style JSON escaping of a string value
    (src/flb_utils.c:857+): backslash, double quote, and the control
    chars \\n \\r \\t \\f \\b; other C0 controls are rare in line
    protocol and handled identically by both engines' regexp path."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    out = F.regexp_replace(out, "\t", r"\\t")
    out = F.regexp_replace(out, "\f", r"\\f")
    out = F.regexp_replace(out, "\b", r"\\b")
    return out


def _render(df: DataFrame, c: str, use_integer: bool) -> tuple[Column, bool]:
    """(rendered value, is_string): influxdb_format's per-type
    rendering (influxdb.c:160-210)."""
    dt = df.schema[c].dataType.simpleString()
    col = F.col(c)
    if dt == "boolean":
        return F.when(col, F.lit("TRUE")).otherwise(F.lit("FALSE")), False
    if dt in ("double", "float"):
        return F.format_string("%f", col.cast("double")), False
    if dt in ("tinyint", "smallint", "int", "bigint", "long"):
        v = col.cast("string")
        if use_integer:
            v = F.concat(v, F.lit("i"))
        return v, False
    return col.cast("string"), True


def to_influx(
    df: DataFrame,
    tag_col: str,
    ts_col: str,
    value_cols: list[str] | None = None,
    tag_keys: list[str] | None = None,
    auto_tags: bool = False,
    sequence_tag: str | None = "_seq",
    use_influxdb_integer: bool = False,
    dedupe_timestamps: bool = False,
) -> DataFrame:
    """Append a ``line`` column holding the InfluxDB line-protocol
    rendering of each record.

    ``value_cols`` defaults to every column except tag/ts. NULL values
    are skipped per-record (missing values are null in InfluxDB,
    influxdb.c:163-166); records whose field set comes out empty are
    dropped, matching the ``bulk_body->len > 0`` guard (:255).

    ``sequence_tag``: the reference's global per-context counter is
    inherently sequential; here the sequence is ``row_number() - 1``
    over (measurement, ts ordering by the field tuple) — deterministic
    under any partitioning, wraps to 1 at 100000 exactly like
    influxdb.c:119-125. Pass None to disable (sequence_tag off).

    ``dedupe_timestamps``: adds influxdb_tsmod's +1ns-per-duplicate as
    a per-(measurement, ns) row_number offset.
    """
    cols = value_cols or [c for c in df.columns if c not in (tag_col, ts_col)]
    tag_set = set(tag_keys or [])

    head_parts: list[Column] = [_esc_key(F.col(tag_col))]
    body_parts: list[Column] = []
    for c in cols:
        rendered, is_str = _render(df, c, use_influxdb_integer)
        key = _esc_key(F.lit(c))
        tagged = c in tag_set or (auto_tags and is_str)
        if is_str:
            rendered = _json_escape(rendered)
        if tagged:
            kv = F.concat(F.lit(","), key, F.lit("="), _esc_key(rendered))
            head_parts.append(F.when(F.col(c).isNotNull(), kv).otherwise(F.lit("")))
        else:
            if is_str:
                rendered = F.concat(
                    F.lit('"'),
                    F.regexp_replace(rendered, _QUOTE_ESC, r"\\$1"),
                    F.lit('"'),
                )
            kv = F.concat(F.lit(","), key, F.lit("="), rendered)
            body_parts.append(F.when(F.col(c).isNotNull(), kv).otherwise(F.lit("")))

    body = (
        F.substring(F.concat(*body_parts), 2, 1 << 30) if body_parts else F.lit("")
    )

    ns = (
        F.unix_micros(F.col(ts_col)) * 1000
        if df.schema[ts_col].dataType.simpleString().startswith("timestamp")
        else F.col(ts_col).cast("long")
    )

    out = df.withColumn("_influx_ns", ns).withColumn("_influx_body", body)
    order = [F.col(c).asc_nulls_last() for c in cols]
    if sequence_tag is not None:
        w = Window.partitionBy(tag_col).orderBy(F.col("_influx_ns"), *order)
        seq = F.row_number().over(w) - 1
        seq = F.when(seq >= 100000, F.lit(1)).otherwise(seq)
        head_parts.insert(
            1,
            F.concat(
                F.lit(","), _esc_key(F.lit(sequence_tag)), F.lit("="),
                seq.cast("string"),
            ),
        )
    if dedupe_timestamps:
        wd = Window.partitionBy(tag_col, "_influx_ns").orderBy(*order)
        out = out.withColumn(
            "_influx_ns", F.col("_influx_ns") + F.row_number().over(wd) - 1
        )

    line = F.concat(
        *head_parts, F.lit(" "), F.col("_influx_body"), F.lit(" "),
        F.col("_influx_ns").cast("string"),
    )
    return (
        out.filter(F.col("_influx_body") != "")
        .withColumn("line", line)
        .drop("_influx_ns", "_influx_body")
    )


# ------------------------------------------------------- metrics path

from .prom_out import _render_value  # noqa: E402 — shared %.17g twin


def _render_g(col: Column) -> Column:
    """C ``%g`` for bucket bounds / quantiles: integral doubles drop
    the fraction ("2" not "2.0"); non-integral values use the JVM
    shortest round-trip string — identical to %g for the <=6
    significant-digit bounds real bucket configs use (the same
    rendering precedent as functions/prom_out._render_value)."""
    d = col.cast("double")
    return F.when(
        (d == F.floor(d).cast("double")) & (F.abs(d) < 1e15),
        d.cast("long").cast("string"),
    ).otherwise(d.cast("string"))


def cmt_influx_lines(
    df: DataFrame,
    measurement: Column | str | None = None,
    static_labels: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """cmetrics -> InfluxDB line protocol (the METRICS event path of
    out_influxdb, influxdb.c:483 → lib/cmetrics/src/
    cmt_encode_influx.c).

    Input rows use the parse_otlp_metrics_df long-row model with
    ``tags`` as array<struct<key,value>> (label order is
    significant in line protocol).  Semantics kept from the C:

    - measurement = ns[_subsystem] (format_metric :240-252); metrics
      with an EMPTY namespace emit NO measurement — the line starts
      at the tag set (or the field set when untagged), reference
      behavior kept.  ``measurement`` maps ns_subsystem directly.
    - static labels (config add_label) come before per-sample tags
      (:255-280); keys and tag values escape whitespace ',' '=' and
      double '\\\\' (line_protocol_escape :183).
    - scalar kinds (:154-181): one field ``<name>=<%.17g value>``
      with the metric NAME NOT escaped (the C cats opts->name raw);
      timestamp nanoseconds, newline-terminated upstream.
    - histogram (:49-108): fields ``<%g bound>=<count>`` per bucket
      plus ``+Inf=<count>``, then ``sum=<%.17g>,count=<u64>``; the
      bucket values are the stored bucket cells, which cmetrics
      keeps cumulative at observe time (cmt_histogram.c:334) — every
      encoder reads the same cells verbatim.
    - summary (:110-152): ``<%g quantile>=<%.17g value>`` pairs then
      sum/count; samples whose quantile set was never written are
      SKIPPED (format_metric :233 sum_quantiles_set check) — here,
      rows with NULL quantile_values.
    - value rendering follows the prom_out precedent: integral
      doubles print bare, others via the JVM shortest round-trip
      string (exact wherever the %.17g form needs <= 17 significant
      digits).
    """
    tags_col = F.col("tags") if "tags" in df.columns else F.array()
    pieces = []
    if measurement is not None:
        m = F.lit(measurement) if isinstance(measurement, str) \
            else measurement
        pieces.append(m)
        has_ns = m.isNotNull() & (m != "")
    else:
        has_ns = F.lit(False)
        pieces.append(F.lit(""))
    static = static_labels or []
    static_str = ",".join(
        f"{k}={v}" for k, v in static  # config constants, pre-escaped
    )
    if static:
        pieces.append(F.when(has_ns, F.lit(",")).otherwise(F.lit("")))
        pieces.append(F.lit(static_str))
    tag_str = F.array_join(
        F.transform(
            tags_col,
            lambda t: F.concat(
                _esc_key(t["key"]), F.lit("="), _esc_key(t["value"])
            ),
        ),
        ",",
    )
    has_tags = F.size(tags_col) > 0
    pieces.append(
        F.when(
            has_tags & (has_ns | F.lit(bool(static))), F.lit(",")
        ).otherwise(F.lit(""))
    )
    pieces.append(F.when(has_tags, tag_str).otherwise(F.lit("")))
    sep = F.when(
        has_ns | F.lit(bool(static)) | has_tags, F.lit(" ")
    ).otherwise(F.lit(""))

    scalar_body = F.concat(
        F.col("name"), F.lit("="), _render_value(F.col("value"))
    )
    hist_keys = F.concat(
        F.transform(F.col("explicit_bounds"), _render_g),
        F.array(F.lit("+Inf")),
    )
    hist_body = F.concat(
        F.array_join(
            F.zip_with(
                hist_keys,
                F.col("bucket_counts"),
                lambda k, c: F.concat(
                    k, F.lit("="), F.coalesce(c, F.lit(0)).cast("string")
                ),
            ),
            ",",
        ),
        F.lit(",sum="), _render_value(F.col("hist_sum")),
        F.lit(",count="), F.col("hist_count").cast("string"),
    )
    summary_body = F.concat(
        F.array_join(
            F.zip_with(
                F.col("quantiles"),
                F.col("quantile_values"),
                lambda q, v: F.concat(
                    _render_g(q), F.lit("="), _render_value(v)
                ),
            ),
            ",",
        ),
        F.lit(",sum="), _render_value(F.col("sum_sum")),
        F.lit(",count="), F.col("sum_count").cast("string"),
    )
    body = (
        F.when(F.col("mtype") == "histogram", hist_body)
        .when(F.col("mtype") == "summary", summary_body)
        .otherwise(scalar_body)
    )
    line = F.concat(*pieces, sep, body, F.lit(" "),
                    F.col("ts").cast("string"))
    out = df.filter(
        (F.col("mtype") != "summary")
        | F.col("quantile_values").isNotNull()
    )
    return out.withColumn("line", line)
