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
