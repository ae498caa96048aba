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
