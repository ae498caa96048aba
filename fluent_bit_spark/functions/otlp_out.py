"""out_opentelemetry: OTLP/JSON logs export encoding.

Reference: /root/reference/plugins/out_opentelemetry/
opentelemetry_logs.c. Per-record LogRecord fields
(append_v1_logs_metadata_and_fields :385-628):

- ``observedTimeUnixNano`` — metadata ``$otlp['observed_timestamp']``
  when positive-int, else the configured metadata accessor (:401-417);
- ``timeUnixNano`` — ``$otlp['timestamp']`` else the configured
  accessor else the EVENT time in nanos (:419-439);
- ``severityNumber`` — first of ``$otlp['severity_number']`` /
  metadata accessor / message-body accessor that is a positive int in
  the valid OTLP range 1..24 (is_valid_severity_number :83-90);
  invalid/absent leaves the field unset (:441-472);
- ``severityText`` — same three-level fallback, string-typed only
  (:474-515);
- ``attributes`` — ``$otlp['attributes']`` map else metadata accessor
  map, converted to a KeyValue array (:517-545);
- ``traceId``/``spanId`` — binary passthrough or 32/16-char hex
  strings decoded to 16/8 bytes; any other shape warns and leaves the
  id unset (pack_trace_id :307-349, pack_span_id :351-383);
- ``body`` — when ``logs_body_key`` matches, that value becomes the
  body AnyValue (stringValue here); otherwise the whole record map
  becomes a kvlistValue (log_record_set_body :157-198).

Batch assembly (otel_process_logs :917-1216): records grouped by the
(resource_id, scope_id) group metadata when the stream is native
otel ($schema == 'otlp', get_otlp_group_metadata :95-155) — resource
attributes / schema_url and scope name / version / attributes come
from the group body; non-otel streams land in one default
resource+scope. Limits: 100 resources x 100 scopes per flush
(:679-681). This encoder emits one ExportLogsServiceRequest JSON row
per (resource, scope) group — the OTLP/HTTP JSON encoding of the
same protobuf tree the reference posts — so a 1000-executor job
shuffles once on the group key and each group renders JVM-side.

Everything is Catalyst column expressions (to_json over nested
structs; null fields pruned by to_json exactly where the reference
leaves protobuf fields unset). No Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "otlp_any_kvlist", "otlp_log_record", "otlp_logs_export",
    "otlp_span", "otlp_traces_export",
]


def _str_attrs(attrs: Column) -> Column:
    """map<string,string> -> OTLP KeyValue array
    [{key, value:{stringValue}}] (msgpack_map_to_otlp_kvarray)."""
    return F.transform(
        F.map_entries(attrs),
        lambda e: F.struct(
            e["key"].alias("key"),
            F.struct(e["value"].alias("stringValue")).alias("value"),
        ),
    )


def otlp_any_kvlist(record: Column) -> Column:
    """map<string,string> record -> body AnyValue
    {"kvlistValue":{"values":[{key,value:{stringValue}}]}}
    (msgpack_object_to_otlp_any_value map branch)."""
    return F.struct(
        F.struct(_str_attrs(record).alias("values")).alias("kvlistValue")
    )


def _hex_id(col: Column, hex_len: int) -> Column:
    """Hex-string trace/span id: exactly hex_len lowercase/upper hex
    chars pass through; anything else is dropped (reference warns
    'invalid trace_id format' and unsets, :339-346)."""
    ok = col.rlike(f"^[0-9a-fA-F]{{{hex_len}}}$")
    return F.when(ok, F.lower(col))


def otlp_log_record(
    ts_nanos: Column,
    *,
    observed_nanos: Column | None = None,
    severity_number: Column | None = None,
    severity_text: Column | None = None,
    attributes: Column | None = None,
    trace_id: Column | None = None,
    span_id: Column | None = None,
    body: Column | None = None,
    record: Column | None = None,
) -> Column:
    """One LogRecord struct. ``body`` (string -> stringValue) wins
    over ``record`` (map -> kvlistValue) per log_record_set_body
    :157-198. OTLP/JSON renders uint64 nanos as decimal strings."""
    fields = [ts_nanos.cast("string").alias("timeUnixNano")]
    if observed_nanos is not None:
        fields.append(
            observed_nanos.cast("string").alias("observedTimeUnixNano"))
    if severity_number is not None:
        sev = severity_number.cast("long")
        fields.append(
            F.when((sev >= 1) & (sev <= 24), sev)
            .alias("severityNumber"))
    if severity_text is not None:
        fields.append(severity_text.alias("severityText"))
    if attributes is not None:
        fields.append(_str_attrs(attributes).alias("attributes"))
    if body is not None:
        fields.append(
            F.struct(body.alias("stringValue")).alias("body"))
    elif record is not None:
        fields.append(otlp_any_kvlist(record).alias("body"))
    if trace_id is not None:
        fields.append(_hex_id(trace_id, 32).alias("traceId"))
    if span_id is not None:
        fields.append(_hex_id(span_id, 16).alias("spanId"))
    return F.struct(*fields)


def otlp_logs_export(
    df: DataFrame,
    log_record: Column,
    *,
    resource_col: Column | None = None,
    scope_col: Column | None = None,
    resource_attrs: Column | None = None,
    scope_name: Column | None = None,
    scope_version: Column | None = None,
) -> DataFrame:
    """Group LogRecords into ExportLogsServiceRequest JSON bodies.

    One output row per (resource, scope) group: columns
    ``resource_id``, ``scope_id``, ``body`` (the OTLP/JSON payload).
    With no group columns everything lands in one default
    resource+scope, mirroring the non-native-otel path of
    otel_process_logs. resource_attrs / scope name+version come from
    the group (set_resource_attributes / set_scope_name :755-880 read
    them from the group-start body, so they are constant per group —
    F.first picks that constant).
    """
    rid = (resource_col if resource_col is not None else F.lit(0)) \
        .alias("resource_id")
    sid = (scope_col if scope_col is not None else F.lit(0)) \
        .alias("scope_id")
    aggs = [F.collect_list(log_record.alias("lr")).alias("records")]
    if resource_attrs is not None:
        aggs.append(F.first(resource_attrs).alias("rattrs"))
    if scope_name is not None:
        aggs.append(F.first(scope_name).alias("sname"))
    if scope_version is not None:
        aggs.append(F.first(scope_version).alias("sver"))
    g = df.groupBy(rid, sid).agg(*aggs)

    scope_fields = []
    if scope_name is not None:
        scope_fields.append(F.col("sname").alias("name"))
    if scope_version is not None:
        scope_fields.append(F.col("sver").alias("version"))
    scope_struct = (
        F.struct(*scope_fields) if scope_fields else None)

    sl_fields = []
    if scope_struct is not None:
        sl_fields.append(scope_struct.alias("scope"))
    sl_fields.append(F.col("records").alias("logRecords"))
    scope_logs = F.array(F.struct(*sl_fields))

    rl_fields = []
    if resource_attrs is not None:
        rl_fields.append(
            F.struct(_str_attrs(F.col("rattrs")).alias("attributes"))
            .alias("resource"))
    rl_fields.append(scope_logs.alias("scopeLogs"))
    payload = F.to_json(
        F.struct(F.array(F.struct(*rl_fields)).alias("resourceLogs")))

    return g.select("resource_id", "scope_id", payload.alias("body"))


def otlp_span(
    name: Column,
    *,
    trace_id: Column | None = None,
    span_id: Column | None = None,
    parent_span_id: Column | None = None,
    kind: Column | None = None,
    start_nanos: Column | None = None,
    end_nanos: Column | None = None,
    attributes: Column | None = None,
    status_code: Column | None = None,
    status_message: Column | None = None,
) -> Column:
    """One OTLP/JSON Span struct (the JSON encoding of the protobuf
    tree out_opentelemetry posts for the traces event type —
    plugins/out_opentelemetry/opentelemetry.c:590 process_traces over
    a CTraces context; span fields per lib/ctraces msgpack layout).

    Ids are validated exactly like the logs encoder (32/16 hex chars
    else unset); uint64 nanos render as decimal strings per the
    protobuf-JSON mapping; ``status.code`` renders as the
    UNSET/OK/ERROR vocabulary the reference's own trace decoder
    accepts (opentelemetry_traces.c:564-586), so an export is
    re-ingestable by in_opentelemetry."""
    fields = [name.alias("name")]
    if trace_id is not None:
        fields.append(_hex_id(trace_id, 32).alias("traceId"))
    if span_id is not None:
        fields.append(_hex_id(span_id, 16).alias("spanId"))
    if parent_span_id is not None:
        fields.append(_hex_id(parent_span_id, 16).alias("parentSpanId"))
    if kind is not None:
        k = kind.cast("long")
        fields.append(F.when((k >= 0) & (k <= 5), k).alias("kind"))
    if start_nanos is not None:
        fields.append(
            start_nanos.cast("string").alias("startTimeUnixNano"))
    if end_nanos is not None:
        fields.append(end_nanos.cast("string").alias("endTimeUnixNano"))
    if attributes is not None:
        fields.append(_str_attrs(attributes).alias("attributes"))
    if status_code is not None or status_message is not None:
        st = []
        if status_code is not None:
            code = status_code.cast("int")
            st.append(
                F.when(code == 0, F.lit("UNSET"))
                .when(code == 1, F.lit("OK"))
                .when(code == 2, F.lit("ERROR"))
                .alias("code"))
        if status_message is not None:
            st.append(status_message.alias("message"))
        fields.append(F.struct(*st).alias("status"))
    return F.struct(*fields)


def otlp_traces_export(
    df: DataFrame,
    span: Column,
    *,
    resource_col: Column | None = None,
    scope_col: Column | None = None,
    resource_attrs: Column | None = None,
    scope_name: Column | None = None,
    scope_version: Column | None = None,
) -> DataFrame:
    """Group Spans into ExportTraceServiceRequest JSON bodies — one
    row per (resource, scope) group, mirroring otlp_logs_export:
    resourceSpans → scopeSpans → spans with resource attributes and
    scope name/version constant per group. Pure Catalyst (one
    exchange on the group key, JVM-side rendering)."""
    rid = (resource_col if resource_col is not None else F.lit(0)) \
        .alias("resource_id")
    sid = (scope_col if scope_col is not None else F.lit(0)) \
        .alias("scope_id")
    aggs = [F.collect_list(span.alias("sp")).alias("spans")]
    if resource_attrs is not None:
        aggs.append(F.first(resource_attrs).alias("rattrs"))
    if scope_name is not None:
        aggs.append(F.first(scope_name).alias("sname"))
    if scope_version is not None:
        aggs.append(F.first(scope_version).alias("sver"))
    g = df.groupBy(rid, sid).agg(*aggs)

    scope_fields = []
    if scope_name is not None:
        scope_fields.append(F.col("sname").alias("name"))
    if scope_version is not None:
        scope_fields.append(F.col("sver").alias("version"))

    ss_fields = []
    if scope_fields:
        ss_fields.append(F.struct(*scope_fields).alias("scope"))
    else:
        # the in_ walk skips scope-less entries only when 'scope' is
        # a non-map; an explicit empty scope keeps round-trips exact
        ss_fields.append(
            F.struct(F.lit(None).cast("string").alias("name"))
            .alias("scope"))
    ss_fields.append(F.col("spans").alias("spans"))
    scope_spans = F.array(F.struct(*ss_fields))

    rs_fields = []
    if resource_attrs is not None:
        rs_fields.append(
            F.struct(_str_attrs(F.col("rattrs")).alias("attributes"))
            .alias("resource"))
    else:
        rs_fields.append(
            F.struct(F.array().alias("attributes")).alias("resource"))
    rs_fields.append(scope_spans.alias("scopeSpans"))
    payload = F.to_json(
        F.struct(F.array(F.struct(*rs_fields)).alias("resourceSpans")))

    return g.select("resource_id", "scope_id", payload.alias("body"))
