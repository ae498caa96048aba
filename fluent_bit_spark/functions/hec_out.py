"""out_splunk (HEC) and out_datadog JSON event encodings.

Splunk reference: /root/reference/plugins/out_splunk/splunk.c —
pack_map (:408): non-raw mode wraps every record as
``{"time": <epoch double>, <meta>, "event": {record}}`` where meta
comes from pack_map_meta (:263): ``event_host`` / ``event_source`` are
record accessors -> "host"/"source"; ``event_sourcetype_key`` (record
lookup, fallback ``event_sourcetype`` static) -> "sourcetype";
``event_index_key``/``event_index`` -> "index"; ``event_field``
entries -> "fields" map. ``event_key`` replaces the event map with one
record value (pack_event_key :484, falling back to the full map when
missing). ``splunk_send_raw`` emits the bare record map (+ newline per
record, splunk_format :750).

Datadog reference: /root/reference/plugins/out_datadog/datadog.c —
one JSON object per record inside a top-level array (:146
msgpack_pack_array): ``{json_date_key: <epoch ms, ns rounded half-up
(timestamp_format :54-62)>, [tag_key: tag], [ddsource], [service],
[hostname], <record kvs with dd_message_key renamed to "message">,
[ddtags]}``.

Both encoders are single to_json projections (WholeStageCodegen);
meta-key presence is decided by configuration, and a configured
record-sourced key whose value is null renders as JSON null (the C
omits it per-record — a documented deviation that keeps the schema
static and the encode columnar; filter upstream when the distinction
matters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_splunk_hec(
    df: DataFrame,
    ts_col: str,
    event_cols: list[str] | None = None,
    host: str | Column | None = None,
    source: str | Column | None = None,
    sourcetype: str | Column | None = None,
    index: str | Column | None = None,
    fields: dict[str, str] | None = None,
    event_key: str | None = None,
    send_raw: bool = False,
) -> Column:
    """One HEC JSON event per record.

    ``host``/``source``/``sourcetype``/``index`` accept a static
    string or a Column (the record-accessor form); ``fields`` maps
    output field names to record column names; ``event_key`` sends a
    single record value as the event (falling back to the record map
    when the column is NULL, splunk.c:693-702).
    """
    cols = event_cols or [c for c in df.columns if c != ts_col]
    event_struct = F.struct(*[F.col(c) for c in cols])
    if send_raw:
        return F.to_json(event_struct, {"ignoreNullFields": "false"})

    parts: list[Column] = [F.col(ts_col).cast("double").alias("time")]
    for name, val in (
        ("host", host), ("source", source),
        ("sourcetype", sourcetype), ("index", index),
    ):
        if val is not None:
            col = F.lit(val) if isinstance(val, str) else val
            parts.append(col.alias(name))
    if fields:
        parts.append(
            F.struct(
                *[F.col(src).alias(name) for name, src in fields.items()]
            ).alias("fields")
        )
    if event_key is not None:
        ev = F.when(
            F.col(event_key).isNotNull(), F.col(event_key).cast("string")
        )
        # NULL event_key value falls back to the full map — two
        # alternate shapes, one when/otherwise JSON pick
        with_key = F.to_json(
            F.struct(*parts, ev.alias("event")),
            {"ignoreNullFields": "false"},
        )
        with_map = F.to_json(
            F.struct(*parts, event_struct.alias("event")),
            {"ignoreNullFields": "false"},
        )
        return F.when(F.col(event_key).isNotNull(), with_key).otherwise(
            with_map
        )
    parts.append(event_struct.alias("event"))
    return F.to_json(F.struct(*parts), {"ignoreNullFields": "false"})


def datadog_ms(ts_col: str) -> Column:
    """Epoch milliseconds with the reference's half-up nanosecond
    rounding (timestamp_format, datadog.c:54-62)."""
    us = F.unix_micros(F.col(ts_col)) + 500
    # subtract the remainder before dividing: the numerator becomes an
    # exact multiple of 1000 (< 2^53), so the double division is exact
    # — plain (us+500)/1000 on epoch-scale longs can misround the floor
    return ((us - (us % 1000)) / 1000).cast("long")


def to_datadog(
    df: DataFrame,
    ts_col: str,
    message_col: str | None = None,
    tag_col: str | None = None,
    include_tag_key: bool = False,
    tag_key: str = "tagkey",
    dd_source: str | None = None,
    dd_service: str | None = None,
    dd_hostname: str | None = None,
    dd_tags: str | None = None,
    date_key: str = "timestamp",
) -> Column:
    """One Datadog intake JSON object per record (the HTTP body is the
    JSON array of these — assemble with collect-free concat_ws over a
    bounded batch, exactly like loki_push_payload)."""
    parts: list[Column] = [datadog_ms(ts_col).alias(date_key)]
    if include_tag_key:
        if not tag_col:
            raise ValueError("include_tag_key needs tag_col")
        parts.append(F.col(tag_col).alias(tag_key))
    if dd_source is not None:
        parts.append(F.lit(dd_source).alias("ddsource"))
    if dd_service is not None:
        parts.append(F.lit(dd_service).alias("service"))
    if dd_hostname is not None:
        parts.append(F.lit(dd_hostname).alias("hostname"))
    for c in df.columns:
        if c in (ts_col, tag_col):
            continue
        parts.append(F.col(c).alias("message" if c == message_col else c))
    if dd_tags is not None:
        parts.append(F.lit(dd_tags).alias("ddtags"))
    return F.to_json(F.struct(*parts), {"ignoreNullFields": "false"})


# ------------------------------------------------------- metrics path


def _hec_double(col: Column) -> Column:
    """cmt_encode_splunk_hec.c double_to_string :32-55: ``%g``, and a
    value whose rendering carries no '.' gets ``.0`` appended (so
    integral values print "3.0"; the "e+"→"%e" branch and the
    "1e-07.0" small-exponent quirk only fire outside the 6
    significant digits real metric values use — rendering follows the
    prom_out shortest round-trip precedent otherwise)."""
    d = col.cast("double")
    return F.when(
        (d == F.floor(d).cast("double")) & (F.abs(d) < 1e15),
        F.concat(d.cast("long").cast("string"), F.lit(".0")),
    ).otherwise(d.cast("string"))


def cmt_splunk_hec_events(
    df: DataFrame,
    host: str,
    index: str | None = None,
    source: str | None = None,
    source_type: str | None = None,
    static_labels: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """cmetrics -> Splunk HEC metric events (the METRICS event path of
    out_splunk, splunk.c → lib/cmetrics/src/cmt_encode_splunk_hec.c).

    Input rows use the parse_otlp_metrics_df long-row model with
    ``tags`` as array<struct<key,value>> plus a ``subsystem`` string
    column (may be empty).  Semantics kept from the C:

    - every event is ``{"host":"H","time":<%09lu.%09lu>,
      "event":"metric",["index":...,]["source":...,]
      ["sourcetype":...,]"fields":{...}}`` — the timestamp prints
      seconds AND nanoseconds both zero-padded to nine digits
      (format_context_common :146).
    - the fields key is ``metric_name:[subsystem.]name`` — the
      NAMESPACE is ignored by this encoder (format_metric_name
      :57-90, only opts->subsystem and opts->name).
    - scalar kinds emit ONE event with no metric_type marker
      (format_metric_data_points :540).
    - a histogram sample fans out to one event PER BUCKET (with
      ``"le"`` as a double_to_string STRING, ``+Inf`` last and
      ``metric_type":"Histogram"``), then a ``_sum`` and a ``_count``
      event — count rendered through double_to_string too ("10.0")
      (format_histogram_bucket :293-406).
    - a summary sample emits one event per quantile (``"qt"`` string,
      metric_type Summary) then _sum/_count; samples whose quantile
      set was never written skip the per-quantile events but still
      emit _sum/_count (format_summary_metric :455 checks
      sum_quantiles_set around the quantile loop only).
    - static labels then per-sample labels inside ``fields``
      (format_metric_labels :216).

    Returns one row per input SAMPLE with an ``event`` column — a
    single JSON event for scalars, the concatenated bucket/quantile +
    _sum/_count event run for histograms/summaries; a chunk body is
    the plain concatenation of rows (the C builds one buffer).
    """
    # integer division/modulo: a double detour loses precision on
    # nanosecond epochs (1.7e18 > 2^53) near second boundaries
    sec = F.expr("ts div 1000000000")
    nsec = (F.col("ts") % F.lit(1_000_000_000)).cast("long")

    def _pad9(c: Column) -> Column:
        # C %09lu pads to a MINIMUM of nine digits but never truncates
        # (Spark lpad would cut an epoch-seconds value to 9 chars)
        s = c.cast("string")
        return F.when(F.length(s) >= 9, s).otherwise(F.lpad(s, 9, "0"))

    head = F.concat(
        F.lit('{"host":"' + host + '","time":'),
        _pad9(sec), F.lit("."),
        _pad9(nsec),
        F.lit(',"event":"metric",'),
        F.lit(f'"index":"{index}",' if index is not None else ""),
        F.lit(f'"source":"{source}",' if source is not None else ""),
        F.lit(f'"sourcetype":"{source_type}",'
              if source_type is not None else ""),
        F.lit('"fields":{'),
    )
    subsystem = F.col("subsystem") if "subsystem" in df.columns \
        else F.lit("")
    mkey = F.concat(
        F.lit('"metric_name:'),
        F.when(subsystem != "", F.concat(subsystem, F.lit(".")))
        .otherwise(F.lit("")),
        F.col("name"),
    )
    static = static_labels or []
    static_str = "".join(
        f',"{k}":"{v}"' for k, v in static  # config constants
    )
    tags_col = F.col("tags") if "tags" in df.columns else F.array()
    labels = F.concat(
        F.lit(static_str),
        F.when(
            F.size(tags_col) > 0,
            F.concat(F.lit(","), F.array_join(
                F.transform(
                    tags_col,
                    lambda t: F.concat(
                        F.lit('"'), t["key"], F.lit('":"'),
                        t["value"], F.lit('"'),
                    ),
                ), ",",
            )),
        ).otherwise(F.lit("")),
    )

    def event(fields: Column) -> Column:
        return F.concat(head, fields, F.lit("}}"))

    scalar = df.filter(~F.col("mtype").isin("histogram", "summary"))
    scalar_out = scalar.select(event(F.concat(
        mkey, F.lit('":'), _hec_double(F.col("value")), labels,
    )).alias("event"))

    hist = df.filter(F.col("mtype") == "histogram")
    bounds_plus = F.concat(
        F.transform(F.col("explicit_bounds"),
                    lambda b: _hec_double(b)),
        F.array(F.lit("+Inf")),
    )
    bucket_events = F.zip_with(
        bounds_plus,
        F.transform(F.col("bucket_counts"),
                    lambda c: _hec_double(c)),
        lambda le, c: event(F.concat(
            mkey, F.lit('_bucket":'), c, F.lit(',"le":"'), le,
            F.lit('"'), labels, F.lit(',"metric_type":"Histogram"'),
        )),
    )
    # reference bug kept: format_histogram_bucket and
    # format_summary_metric declare `uint64_t metric_val`, so the
    # double _sum value TRUNCATES to its integer part before
    # double_to_string (10.75 -> "10.0", 6.5 -> "6.0"); bucket and
    # quantile values go through a `double` and render exactly
    hist_out = hist.select(F.concat(
        F.array_join(bucket_events, ""),
        event(F.concat(mkey, F.lit('_sum":'),
                       _hec_double(F.col("hist_sum").cast("long")),
                       labels,
                       F.lit(',"metric_type":"Histogram"'))),
        event(F.concat(mkey, F.lit('_count":'),
                       _hec_double(F.col("hist_count")), labels,
                       F.lit(',"metric_type":"Histogram"'))),
    ).alias("event"))

    summ = df.filter(F.col("mtype") == "summary")
    q_events = F.when(
        F.col("quantile_values").isNotNull(),
        F.array_join(F.zip_with(
            F.transform(F.col("quantiles"), lambda q: _hec_double(q)),
            F.transform(F.col("quantile_values"),
                        lambda v: _hec_double(v)),
            lambda q, v: event(F.concat(
                mkey, F.lit('":'), v, F.lit(',"qt":"'), q, F.lit('"'),
                labels, F.lit(',"metric_type":"Summary"'),
            )),
        ), ""),
    ).otherwise(F.lit(""))
    summ_out = summ.select(F.concat(
        q_events,
        event(F.concat(mkey, F.lit('_sum":'),
                       _hec_double(F.col("sum_sum").cast("long")),
                       labels,
                       F.lit(',"metric_type":"Summary"'))),
        event(F.concat(mkey, F.lit('_count":'),
                       _hec_double(F.col("sum_count")), labels,
                       F.lit(',"metric_type":"Summary"'))),
    ).alias("event"))

    return scalar_out.unionByName(hist_out).unionByName(summ_out)
