"""out_stackdriver: Cloud Logging LogEntry encoding.

Reference: /root/reference/plugins/out_stackdriver/stackdriver.c
stackdriver_format (:1697-2589) — per record, the entry map is built
in this exact key order: severity (packed as the numeric enum,
:2419 msgpack_pack_int), trace (optionally autoformatted to
``projects/<id>/traces/<t>``, :2427), spanId, traceSampled, insertId,
operation, sourceLocation, httpRequest, labels, textPayload|
jsonPayload, logName (``projects/<project>/logs/<name>``; the tag
unless log_name_key extracted; k8s stdout/stderr stream renames the
tag, :2511-2546), timestamp (``%Y-%m-%dT%H:%M:%S.%09dZ``, :2563-2581).

Severity enum (validate_severity_level :1321-1384): case-insensitive
EXACT-length tokens; EMERGENCY=800 (EMERG), ALERT=700 (A), CRITICAL=
600 (C/F/CRIT/FATAL), ERROR=500 (E/ERR/SEVERE), WARNING=400 (W/WARN),
NOTICE=300 (N), INFO=200 (I), DEBUG=100 (D/TRACE/TRACE_INT/FINE/
FINER/FINEST/CONFIG), DEFAULT=0.

Special payload fields (pack_payload :1480-1695): the
``logging.googleapis.com/*`` keys (monitored_resource,
local_resource_id, projectId, labels, severity, trace, spanId,
traceSampled, logName) plus ``stream`` are REMOVED from the payload;
insertId must be a non-empty string or the whole record is DROPPED
(validate_insert_id :1451, the ``continue`` at :2326); operation /
sourceLocation / httpRequest maps are consumed into typed entry
fields (stackdriver_operation.c, stackdriver_source_location.c,
stackdriver_http_request.c) with unknown subfields left behind under
the original key; ``timestamp: {seconds,nanos}`` or the
timestampSeconds/timestampNanos duo override the event time and are
removed (stackdriver_timestamp.c:170, seconds==0 keeps the event time
but still strips the keys). If after removal exactly ONE string field
remains and it is ``text_payload_key``, it becomes textPayload;
otherwise the residue is jsonPayload.

httpRequest always emits all 14 typed subfields (empty strings / 0 /
false defaults) plus latency only when it matches
``^\\s*\\d+(.\\d+)?\\s*s\\s*$`` (then squeezed to digits/./s).
Reference bug kept (opt-out ``cache_hit_bug=False``):
add_http_request_field packs the *cacheLookup* value for BOTH
cacheLookup and cacheHit (stackdriver_http_request.c:165-176).

Labels: payload labels map (under labels_key) first, then config
labels — last wins, so static config labels override payload ones
(pack_labels :1146-1155).

Python-side per record because the semantics are dynamic-map rewrites
(key removal, type-dependent extraction) — runs inside Arrow
``mapInPandas`` batches, never row-at-a-time UDFs.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

from pyspark.sql import DataFrame

GOOGLE = "logging.googleapis.com/"
DEFAULT_SEVERITY_KEY = GOOGLE + "severity"
DEFAULT_PROJECT_ID_KEY = GOOGLE + "projectId"
DEFAULT_LABELS_KEY = GOOGLE + "labels"
DEFAULT_TRACE_KEY = GOOGLE + "trace"
DEFAULT_SPAN_ID_KEY = GOOGLE + "spanId"
DEFAULT_TRACE_SAMPLED_KEY = GOOGLE + "traceSampled"
DEFAULT_LOG_NAME_KEY = GOOGLE + "logName"
DEFAULT_INSERT_ID_KEY = GOOGLE + "insertId"
OPERATION_KEY = GOOGLE + "operation"
SOURCE_LOCATION_KEY = GOOGLE + "sourceLocation"
DEFAULT_HTTP_REQUEST_KEY = GOOGLE + "http_request"
MONITORED_RESOURCE_KEY = GOOGLE + "monitored_resource"
LOCAL_RESOURCE_ID_KEY = GOOGLE + "local_resource_id"

SEVERITY = {}
for _lvl, _names in [
    (800, ["EMERGENCY", "EMERG"]),
    (700, ["A", "ALERT"]),
    (600, ["C", "F", "CRIT", "FATAL", "CRITICAL"]),
    (500, ["E", "ERR", "ERROR", "SEVERE"]),
    (400, ["W", "WARN", "WARNING"]),
    (300, ["N", "NOTICE"]),
    (200, ["I", "INFO"]),
    (100, ["D", "DEBUG", "TRACE", "TRACE_INT", "FINE", "FINER",
           "FINEST", "CONFIG"]),
    (0, ["DEFAULT"]),
]:
    for _n in _names:
        SEVERITY[_n] = _lvl

_LATENCY_RE = re.compile(r"^\s*\d+(.\d+)?\s*s\s*$")

_HTTP_STR = ["requestMethod", "requestUrl", "userAgent", "remoteIp",
             "serverIp", "referer", "protocol"]
_HTTP_INT = ["requestSize", "responseSize", "status", "cacheFillBytes"]
_HTTP_BOOL = ["cacheLookup", "cacheHit", "cacheValidatedWithOriginServer"]


def _get_int(v) -> int:
    """get_integer (stackdriver_timestamp.c:29): int, or all-digit
    string via atoll; anything else 0."""
    if isinstance(v, bool):
        return 0
    if isinstance(v, int) and v >= 0:
        return v
    if isinstance(v, str) and v.isdigit() and len(v) <= 31:
        return int(v)
    return 0


def _sub_int(v) -> int | None:
    """try_assign_subfield_int: positive int, or atoll on a string."""
    if isinstance(v, bool):
        return None
    if isinstance(v, int) and v >= 0:
        return v
    if isinstance(v, str):
        m = re.match(r"\s*[+-]?\d+", v)
        return int(m.group()) if m else 0
    return None


def _extract_struct(
    record: dict, key: str, known_str: list[str],
    known_bool: list[str] = (), known_int: list[str] = (),
) -> tuple[dict | None, dict | None]:
    """Generic operation/sourceLocation-style extraction: returns
    (typed subfields, extra unknown subfields) or (None, None)."""
    sub = record.get(key)
    if not isinstance(sub, dict):
        return None, None
    out: dict = {}
    extra: dict = {}
    for k, v in sub.items():
        if k in known_str:
            if isinstance(v, str):
                out[k] = v
        elif k in known_bool:
            if isinstance(v, bool):
                out[k] = v
        elif k in known_int:
            iv = _sub_int(v)
            if iv is not None:
                out[k] = iv
        else:
            extra[k] = v
    return out, extra


def _extract_timestamp(record: dict) -> tuple[str | None, int, int]:
    """-> (status, seconds, nanos); status is 'object'/'duo'/None."""
    ts = record.get("timestamp")
    if isinstance(ts, dict) and "seconds" in ts and "nanos" in ts:
        return "object", _get_int(ts["seconds"]), _get_int(ts["nanos"])
    if "timestampSeconds" in record and "timestampNanos" in record:
        return ("duo", _get_int(record["timestampSeconds"]),
                _get_int(record["timestampNanos"]))
    return None, 0, 0


def _fmt_time(sec: int, nanos: int) -> str:
    import time as _time

    tm = _time.gmtime(sec)
    return _time.strftime("%Y-%m-%dT%H:%M:%S", tm) + ".%09dZ" % nanos


def stackdriver_entry(
    record: dict,
    tag: str,
    sec: int,
    nanos: int,
    project_id: str,
    export_to_project_id: str | None = None,
    severity_key: str = DEFAULT_SEVERITY_KEY,
    trace_key: str = DEFAULT_TRACE_KEY,
    span_id_key: str = DEFAULT_SPAN_ID_KEY,
    trace_sampled_key: str = DEFAULT_TRACE_SAMPLED_KEY,
    log_name_key: str = DEFAULT_LOG_NAME_KEY,
    project_id_key: str = DEFAULT_PROJECT_ID_KEY,
    labels_key: str = DEFAULT_LABELS_KEY,
    http_request_key: str = DEFAULT_HTTP_REQUEST_KEY,
    text_payload_key: str | None = None,
    autoformat_stackdriver_trace: bool = False,
    config_labels: dict[str, str] | None = None,
    k8s_resource: bool = False,
    cache_hit_bug: bool = True,
) -> dict | None:
    """One record map -> LogEntry dict (None = record dropped)."""
    export_to = export_to_project_id or project_id
    entry: dict = {}

    sev = record.get(severity_key)
    if isinstance(sev, str) and sev.upper() in SEVERITY:
        entry["severity"] = SEVERITY[sev.upper()]

    trace = record.get(trace_key)
    if isinstance(trace, str):
        if autoformat_stackdriver_trace:
            trace = f"projects/{project_id}/traces/{trace}"
        entry["trace"] = trace

    span_id = record.get(span_id_key)
    if isinstance(span_id, str):
        entry["spanId"] = span_id

    sampled = record.get(trace_sampled_key)
    if isinstance(sampled, bool):
        entry["traceSampled"] = sampled

    insert_id = record.get(DEFAULT_INSERT_ID_KEY)
    if DEFAULT_INSERT_ID_KEY in record:
        if isinstance(insert_id, str) and insert_id:
            entry["insertId"] = insert_id
        else:
            return None  # INSERTID_INVALID -> skip whole record

    op, op_extra = _extract_struct(
        record, OPERATION_KEY, ["id", "producer"], ["first", "last"])
    if op is not None:
        entry["operation"] = {
            "id": op.get("id", ""), "producer": op.get("producer", ""),
            "first": op.get("first", False), "last": op.get("last", False),
        }

    loc, loc_extra = _extract_struct(
        record, SOURCE_LOCATION_KEY, ["file", "function"], (), ["line"])
    if loc is not None:
        entry["sourceLocation"] = {
            "file": loc.get("file", ""), "line": loc.get("line", 0),
            "function": loc.get("function", ""),
        }

    http, http_extra = _extract_struct(
        record, http_request_key, _HTTP_STR + ["latency"], _HTTP_BOOL,
        _HTTP_INT)
    if http is not None:
        hr: dict = {}
        lat = http.get("latency", "")
        if lat and _LATENCY_RE.match(lat) and len(lat) <= 32:
            hr["latency"] = "".join(
                c for c in lat if c.isdigit() or c in ".s")
        for k in _HTTP_STR:
            hr[k] = http.get(k, "")
        for k in _HTTP_INT:
            hr[k] = http.get(k, 0)
        hr["cacheLookup"] = http.get("cacheLookup", False)
        # reference bug: cacheHit is packed from the cacheLookup value
        hr["cacheHit"] = (hr["cacheLookup"] if cache_hit_bug
                          else http.get("cacheHit", False))
        hr["cacheValidatedWithOriginServer"] = http.get(
            "cacheValidatedWithOriginServer", False)
        entry["httpRequest"] = hr

    payload_labels = record.get(labels_key)
    if payload_labels is not None and not isinstance(payload_labels, dict):
        raise ValueError("the type of payload labels should be map")
    labels: dict = {}
    if isinstance(payload_labels, dict):
        labels.update(payload_labels)
    if config_labels:
        labels.update(config_labels)  # static keys override payload
    if labels:
        entry["labels"] = labels

    tms_status, t_sec, t_nanos = _extract_timestamp(record)
    if tms_status is not None and t_sec != 0:
        sec, nanos = t_sec, t_nanos

    # ---- residual payload
    removed = {
        MONITORED_RESOURCE_KEY, LOCAL_RESOURCE_ID_KEY, project_id_key,
        labels_key, severity_key, trace_key, span_id_key,
        trace_sampled_key, log_name_key, "stream", DEFAULT_INSERT_ID_KEY,
    }
    payload: dict = {}
    for k, v in record.items():
        if k in removed:
            continue
        if k == OPERATION_KEY and isinstance(v, dict):
            if op_extra:
                payload[k] = op_extra
            continue
        if k == SOURCE_LOCATION_KEY and isinstance(v, dict):
            if loc_extra:
                payload[k] = loc_extra
            continue
        if k == http_request_key and isinstance(v, dict):
            if http_extra:
                payload[k] = http_extra
            continue
        if k == "timestamp" and tms_status == "object":
            continue
        if k in ("timestampSeconds", "timestampNanos") and \
                tms_status == "duo":
            continue
        payload[k] = v

    text = payload.get(text_payload_key) if text_payload_key else None
    if len(payload) == 1 and isinstance(text, str):
        entry["textPayload"] = text
    else:
        entry["jsonPayload"] = payload

    # ---- logName
    newtag = tag
    if k8s_resource and record.get("stream") in ("stdout", "stderr"):
        newtag = record["stream"]
    log_name = record.get(log_name_key)
    if not isinstance(log_name, str):
        log_name = newtag
    rec_project = record.get(project_id_key)
    project = rec_project if isinstance(rec_project, str) else export_to
    entry["logName"] = f"projects/{project}/logs/{log_name}"

    entry["timestamp"] = _fmt_time(sec, nanos)
    return entry


def encode_stackdriver(
    df: DataFrame,
    project_id: str,
    record_col: str = "record",
    tag_col: str = "tag",
    ts_col: str | None = "ts",
    **opts,
) -> DataFrame:
    """DataFrame with a JSON record column -> one LogEntry JSON string
    per surviving record (columns ``tag``, ``entry``). Arrow-batched."""
    import pandas as pd
    from pyspark.sql import functions as F

    cols = [F.col(record_col).alias("_rec"), F.col(tag_col).alias("_tag")]
    if ts_col is not None:
        cols.append(F.unix_micros(F.col(ts_col)).alias("_us"))
    else:
        cols.append(F.lit(0).cast("long").alias("_us"))
    src = df.select(*cols)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tags, out = [], []
            for rec, tag, us in zip(pdf["_rec"], pdf["_tag"], pdf["_us"]):
                try:
                    record = json.loads(rec)
                except (TypeError, ValueError):
                    continue
                if not isinstance(record, dict):
                    continue
                us = int(us)
                e = stackdriver_entry(
                    record, tag, us // 1_000_000,
                    (us % 1_000_000) * 1000, project_id, **opts)
                if e is not None:
                    tags.append(tag)
                    out.append(json.dumps(e, separators=(",", ":")))
            yield pd.DataFrame(
                {"tag": pd.Series(tags, dtype="object"),
                 "entry": pd.Series(out, dtype="object")}
            )

    return src.mapInPandas(enc, "tag string, entry string")


def stackdriver_request_body(
    entries: list[str],
    resource_type: str = "global",
    resource_labels: dict[str, str] | None = None,
) -> str:
    """entries:write envelope: resource + entries (+ partialSuccess
    when test-less), stackdriver.c:2157-2243. ``entries`` are already
    JSON-encoded LogEntry strings."""
    labels = json.dumps(resource_labels or {}, separators=(",", ":"))
    body = (
        '{"resource":{"type":%s,"labels":%s},"entries":[%s]}'
        % (json.dumps(resource_type), labels, ",".join(entries))
    )
    return body
