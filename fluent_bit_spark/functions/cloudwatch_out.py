"""out_cloudwatch_logs: PutLogEvents event encoding + batching math.

Reference: /root/reference/plugins/out_cloudwatch_logs/cloudwatch_api.c
- add_event (:380-470): the event message is the record rendered to
  JSON and then JSON-STRING-ESCAPED (flb_utils_write_str) — or, with
  ``log_key`` set, that single value's escaped rendering (the code
  strips the surrounding quotes, :447-452); empty messages are
  discarded (:404) and the escaped message is truncated to
  MAX_EVENT_LEN = 262118 bytes (:344-352, truncate_log cuts bytes with
  no regard for escape-sequence boundaries — kept).
- write_event (:245-280): ``{"timestamp":<ms>,"message":"<escaped>"}``
  with ms = sec*1000 + nsec/1e6 (:464).
- compare_events (:174): events are sorted by timestamp ascending
  before writing, and a PutLogEvents payload holds at most
  MAX_EVENTS_PER_PUT = 10000 events within PUT_LOG_EVENTS_PAYLOAD_SIZE
  = 1048576 bytes counting 72 header + 4 footer + 42 + len per event.

The escape runs in Catalyst: ``to_json(array(<string>))`` renders
``["<escaped>"]`` with exactly the JSON string escaping the reference
applies, so the encoder stays whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_EVENT_LEN = 262118
MAX_EVENTS_PER_PUT = 10000
PAYLOAD_SIZE = 1048576
HEADER_LEN = 72
FOOTER_LEN = 4
PER_EVENT_LEN = 42


def _escaped(col: Column) -> Column:
    """JSON string escaping of a string column (no quotes)."""
    arr = F.to_json(F.array(col))  # ["<escaped>"]
    return F.substring(arr, 3, F.length(arr) - 4)


def to_cloudwatch_event(
    df: DataFrame,
    ts_col: str,
    tag_col: str = "tag",
    log_key: str | None = None,
) -> Column:
    """One PutLogEvents event JSON per record; NULL for records the
    reference discards (empty message / missing log_key)."""
    if log_key is not None:
        msg_src = F.col(log_key).cast("string")
    else:
        msg_src = F.to_json(
            F.struct(*[df[c] for c in df.columns
                       if c not in (ts_col, tag_col)
                       and not c.startswith("_")]),
            {"ignoreNullFields": "false"},
        )
    esc = _escaped(msg_src)
    esc = F.substring(esc, 1, MAX_EVENT_LEN)  # truncate_log, byte cut
    us = F.unix_micros(F.col(ts_col))
    ms = ((us - us % 1000) / 1000).cast("long")
    event = F.concat(
        F.lit('{"timestamp":'), ms.cast("string"),
        F.lit(',"message":"'), esc, F.lit('"}'),
    )
    # discard empty messages; with log_key, missing key drops the record
    return F.when(
        msg_src.isNotNull() & (F.length(msg_src) > 0), event)


def cloudwatch_payloads(
    events: list[tuple[int, str]],
    max_events: int = MAX_EVENTS_PER_PUT,
    max_payload: int = PAYLOAD_SIZE,
) -> list[str]:
    """(ts_ms, event_json) list -> PutLogEvents ``logEvents`` arrays,
    sorted by timestamp with the reference's count/size caps."""
    ordered = sorted(events, key=lambda e: e[0])
    out: list[str] = []
    batch: list[str] = []
    size = HEADER_LEN + FOOTER_LEN
    for _, ev in ordered:
        ev_bytes = len(ev) + PER_EVENT_LEN
        if batch and (len(batch) >= max_events
                      or size + ev_bytes > max_payload):
            out.append("[" + ",".join(batch) + "]")
            batch, size = [], HEADER_LEN + FOOTER_LEN
        batch.append(ev)
        size += ev_bytes
    if batch:
        out.append("[" + ",".join(batch) + "]")
    return out


# ------------------------------------- out_kinesis_streams / out_kinesis_firehose

# Reference: /root/reference/plugins/out_kinesis_streams/kinesis_api.c
# and out_kinesis_firehose/firehose_api.c (the record path is shared
# code): each record renders to JSON (or, with log_key, EVERY map key
# the configured name prefix-matches emits that VALUE's JSON with its
# first and last characters blindly stripped — the quote-strip quirk,
# :253-262, applied to non-strings too); empty renders ('""', '{}')
# are discarded (:266-269); time_key appends ,"<key>":"<strftime>"
# over the closing char (:272-320, the blind overwrite-last-char
# merge); a newline is appended (:281); the PutRecords entry is
# {"Data":"<base64>","PartitionKey":"<pk>"} (:148-166) — firehose
# omits PartitionKey. The partition key is random_partition_key
# (:104-137): "%lu%lu" of djb2(tag) % 7919 and
# (5381 * sec * nsec) % 7919 in uint64 wraparound.

DEFAULT_TIME_KEY_FORMAT = "%Y-%m-%dT%H:%M:%S"  # kinesis.h:30

_U64 = 1 << 64


def kinesis_partition_key(tag: str, sec: int, nsec: int) -> str:
    """Exact random_partition_key (kinesis_api.c:104-137) given the
    flb_time the reference reads from the clock."""
    h = 5381
    for c in tag.encode():
        h = (((h << 5) + h) + c) % _U64
    h2 = (5381 * sec % _U64) * nsec % _U64
    return f"{h % 7919}{h2 % 7919}"


_DEC = "decimal(38,0)"


def kinesis_partition_key_col(
    tag_col: Column, sec: Column, nsec: Column
) -> Column:
    """Catalyst twin of kinesis_partition_key — C uint64 wraparound
    emulated with decimal(38,0) arithmetic mod 2^64 (ANSI mode makes
    plain long products throw on overflow). Tags are ASCII in the
    reference's tag space, so per-char ascii() == per-byte walk."""
    u64 = F.lit(str(_U64)).cast(_DEC)  # 2^64 exceeds lit()'s long
    h = F.aggregate(
        F.transform(F.split(tag_col, ""), lambda ch: F.ascii(ch)),
        F.lit(5381).cast(_DEC),
        lambda acc, c: F.pmod(acc * 33 + c.cast(_DEC), u64),
    )
    h2 = F.pmod(
        F.pmod(F.lit(5381).cast(_DEC) * sec.cast(_DEC), u64)
        * nsec.cast(_DEC),
        u64,
    )
    return F.concat(
        F.pmod(h, F.lit(7919)).cast("long").cast("string"),
        F.pmod(h2, F.lit(7919)).cast("long").cast("string"),
    )


def aws_strftime_col(
    ts_col: str, fmt: str = DEFAULT_TIME_KEY_FORMAT
) -> Column:
    """flb_aws_strftime_precision (src/aws/flb_aws_util.c:1043):
    %3N -> zero-padded milliseconds, %9N / %L -> zero-padded
    nanoseconds (micros*1000 here — Spark timestamps are micro-
    precision), the rest plain gmtime strftime."""
    from fluent_bit_spark.functions.es_out import strftime_to_spark

    us = F.unix_micros(F.col(ts_col))
    frac_us = F.pmod(us, F.lit(1_000_000))
    ms = F.lpad(((frac_us - F.pmod(frac_us, 1000)) / 1000)
                .cast("long").cast("string"), 3, "0")
    ns = F.concat(F.lpad(frac_us.cast("string"), 6, "0"), F.lit("000"))
    parts: list[Column] = []
    buf = ""
    i = 0
    while i < len(fmt):
        tok3 = fmt[i:i + 3]
        tok2 = fmt[i:i + 2]
        if tok3 in ("%3N", "%9N") or tok2 == "%L":
            if buf:
                parts.append(F.date_format(
                    F.col(ts_col), strftime_to_spark(buf)))
                buf = ""
            parts.append(ms if tok3 == "%3N" else ns)
            i += 3 if tok3 in ("%3N", "%9N") else 2
        else:
            buf += fmt[i:i + 2] if fmt[i] == "%" else fmt[i]
            i += 2 if fmt[i] == "%" else 1
    if buf:
        parts.append(F.date_format(F.col(ts_col), strftime_to_spark(buf)))
    return parts[0] if len(parts) == 1 else F.concat(*parts)


def to_kinesis_record(
    df: DataFrame,
    ts_col: str,
    tag_col: str = "tag",
    *,
    log_key: str | None = None,
    time_key: str | None = None,
    time_key_format: str = DEFAULT_TIME_KEY_FORMAT,
    partition_key: Column | None = None,
    firehose: bool = False,
) -> Column:
    """One PutRecords/PutRecordBatch entry JSON per record; NULL for
    records the reference discards (empty render). The newline the
    reference appends to every record rides inside Data before
    base64. partition_key defaults to the reference's random key
    seeded from the event time (pass a Column for a custom layout).

    Deviation noted: with log_key on a NON-string value the C code
    still strips the first/last char of the raw JSON render (123 ->
    "2", kinesis_api.c:253-262); this encoder casts to string first,
    so non-string log_key values keep their digits. String values —
    the only shape the plugin documents — are byte-identical."""
    if log_key is not None:
        rendered = F.to_json(F.array(F.col(log_key).cast("string")))
        rendered = F.substring(rendered, 2, F.length(rendered) - 2)
    else:
        rendered = F.to_json(
            F.struct(*[df[c] for c in df.columns
                       if c not in (ts_col, tag_col)
                       and not c.startswith("_")]),
            {"ignoreNullFields": "false"},
        )
    discarded = F.length(rendered) <= 2
    if log_key is not None:
        # blind first/last char strip (:253-262)
        rendered = F.substring(rendered, 2, F.length(rendered) - 2)
    if time_key is not None:
        rendered = F.concat(
            F.substring(rendered, 1, F.length(rendered) - 1),
            F.lit(',"' + time_key + '":"'),
            aws_strftime_col(ts_col, time_key_format),
            F.lit('"}'),
        )
    data = F.base64(F.encode(F.concat(rendered, F.lit("\n")), "UTF-8"))
    if firehose:
        entry = F.concat(F.lit('{"Data":"'), data, F.lit('"}'))
    else:
        if partition_key is None:
            us = F.unix_micros(F.col(ts_col))
            partition_key = kinesis_partition_key_col(
                F.col(tag_col),
                F.floor(us / 1_000_000),
                F.pmod(us, 1_000_000) * 1000,
            )
        entry = F.concat(
            F.lit('{"Data":"'), data,
            F.lit('","PartitionKey":"'), partition_key, F.lit('"}'),
        )
    return F.when(~discarded, entry)


# ------------------------------------------------- EMF (metrics path)


def cmt_emf_events(
    df: DataFrame,
    namespace: Column | str | None = None,
    static_labels: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """cmetrics -> CloudWatch EMF log events (the METRICS event path
    of out_cloudwatch_logs, cloudwatch_api.c → lib/cmetrics/src/
    cmt_encode_cloudwatch_emf.c), one JSON object per sample.

    Input rows use the parse_otlp_metrics_df long-row model with
    ``tags`` as array<struct<key,value>>; ``name`` is the cmetrics
    fqname.  Semantics kept from the C:

    - per-sample object key order (pack_metric :193):
      ``_aws`` (Timestamp ms = ts_ns/1e6; CloudWatchMetrics[0] with
      Namespace, Dimensions, Metrics), sample labels, static labels,
      ``prom_metric_type``, then ``<fqname>: value``.
    - Namespace falls back to ``cmetrics-metrics`` only when the
      cmt namespace pointer is NULL (pack_basic_header :57-63);
      pass None for that fallback.
    - Dimensions names ALL the map's label keys plus the static
      keys (pack_basic_header :65-82) — even when this sample
      carries fewer label values, a reference quirk kept via the
      ``dim_keys`` column (defaults to this row's tag keys).
    - only counters carry ``"Unit":"Counter"`` in the Metrics entry;
      everything gets ``StorageResolution: 60`` (pack_metric
      :225-240).
    - histogram value = {Min,Max,Sum,Count} over the per-bucket
      COUNTS, where the C selection-sorts the count+1 buckets
      ascending and reads Max at index count-1 — the SECOND-largest
      bucket count (pack_histogram_metric :117-155, off-by-one
      kept); summary value = {Min,Max,Sum,Count} with Min/Max the
      first/last quantile VALUES (pack_summary_metric :166-190).
    - doubles render via the shortest round-trip string (the
      msgpack→JSON %.17g precedent shared with prom_out).
    """
    from .prom_out import _render_value

    if namespace is None:
        ns = F.lit("cmetrics-metrics")
    elif isinstance(namespace, str):
        ns = F.lit(namespace)
    else:
        ns = namespace
    tags_col = F.col("tags") if "tags" in df.columns else F.array()
    static = static_labels or []
    dim_keys = F.col("dim_keys") if "dim_keys" in df.columns else \
        F.transform(tags_col, lambda t: t["key"])
    dims = F.concat(
        F.lit("["),
        F.array_join(
            F.concat(
                F.transform(dim_keys,
                            lambda k: F.concat(F.lit('"'), k, F.lit('"'))),
                F.array(*[F.lit(f'"{k}"') for k, _ in static]),
            ),
            ",",
        ),
        F.lit("]"),
    )
    unit = F.when(F.col("mtype") == "counter",
                  F.lit('"Unit":"Counter",')).otherwise(F.lit(""))
    aws = F.concat(
        F.lit('{"_aws":{"Timestamp":'),
        # integer division: a double detour would lose precision on
        # nanosecond epochs (1.7e18 > 2^53)
        F.expr("ts div 1000000").cast("string"),
        F.lit(',"CloudWatchMetrics":[{"Namespace":"'), ns,
        F.lit('","Dimensions":['), dims,
        F.lit('],"Metrics":[{"Name":"'), F.col("name"),
        F.lit('",'), unit,
        F.lit('"StorageResolution":60}]}]}'),
    )
    labels = F.concat(
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
        F.lit("".join(f',"{k}":"{v}"' for k, v in static)),
    )
    sorted_counts = F.array_sort(F.col("bucket_counts"))
    hist_val = F.concat(
        F.lit('{"Min":'),
        _render_value(F.element_at(sorted_counts, 1)),
        F.lit(',"Max":'),
        _render_value(
            F.element_at(sorted_counts, F.size(sorted_counts) - 1)),
        F.lit(',"Sum":'), _render_value(F.col("hist_sum")),
        F.lit(',"Count":'), _render_value(F.col("hist_count")),
        F.lit("}"),
    )
    summ_val = F.concat(
        F.lit('{"Min":'),
        _render_value(F.element_at(F.col("quantile_values"), 1)),
        F.lit(',"Max":'),
        _render_value(F.element_at(
            F.col("quantile_values"),
            F.size(F.col("quantile_values")))),
        F.lit(',"Sum":'), _render_value(F.col("sum_sum")),
        F.lit(',"Count":'), _render_value(F.col("sum_count")),
        F.lit("}"),
    )
    value = (
        F.when(F.col("mtype") == "histogram", hist_val)
        .when(F.col("mtype") == "summary", summ_val)
        .otherwise(_render_value(F.col("value")))
    )
    event = F.concat(
        aws, labels,
        F.lit(',"prom_metric_type":"'), F.col("mtype"),
        F.lit('","'), F.col("name"), F.lit('":'), value, F.lit("}"),
    )
    return df.withColumn("event", event)
