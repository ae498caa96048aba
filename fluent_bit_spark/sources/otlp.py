"""in_opentelemetry: OTLP/JSON logs decoding.

Reference: /root/reference/plugins/in_opentelemetry/
opentelemetry_logs.c — process_json_payload_log_records_entry
(:354-630):
- time = timeUnixNano | time_unix_nano | observedTimeUnixNano |
  observed_time_unix_nano (int or digit-string, :378-420); absent ->
  arrival time;
- per-record OTLP metadata under ``logs_metadata_key`` (default
  "otlp"): observed_timestamp, severity_number, severity_text,
  attributes (kvlist converted), trace_id, span_id (:500-575);
- body is an AnyValue (opentelemetry_utils.c:70
  json_payload_get_wrapped_value — single-key stringValue/boolValue/
  intValue/doubleValue/bytesValue/arrayValue/kvlistValue maps, camel
  or snake case; intValue digit-strings parse to int64). A kvlist
  body becomes the record map itself; any other unwrapped value lands
  under ``logs_body_key`` (default "log", :578-600); a plain map
  that is NOT an AnyValue wrapper passes through with its values
  converted (json_payload_append_converted_map :128-160).

Deviation noted: the C kvlistValue/arrayValue branch hands the
wrapper map to array-shaped converters (a union misread on non-spec
payloads); this decoder follows the OTLP JSON spec shape
({"values": [...]}), which is the case the reference's own test
payloads exercise.

The envelope walk accepts resourceLogs/resource_logs ->
scopeLogs/scope_logs -> logRecords/log_records.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

from pyspark.sql import DataFrame

_WRAP_KEYS = {
    "stringvalue": "str", "string_value": "str",
    "boolvalue": "bool", "bool_value": "bool",
    "intvalue": "int", "int_value": "int",
    "doublevalue": "double", "double_value": "double",
    "bytesvalue": "bytes", "bytes_value": "bytes",
    "arrayvalue": "array", "array_value": "array",
    "kvlistvalue": "kvlist", "kvlist_value": "kvlist",
}


def _first(d: dict, *names):
    for n in names:
        if n in d:
            return d[n]
    return None


def _wrapped_type(v: Any) -> str | None:
    if isinstance(v, dict) and len(v) == 1:
        (k,) = v.keys()
        if isinstance(k, str):
            return _WRAP_KEYS.get(k.lower())
    return None


def unwrap_any_value(v: Any) -> Any:
    """AnyValue -> plain value; non-wrapper maps pass through with
    converted members (converted_map fallthrough)."""
    t = _wrapped_type(v)
    if t is None:
        if isinstance(v, dict):
            return {k: unwrap_any_value(val) for k, val in v.items()}
        if isinstance(v, list):
            return [unwrap_any_value(x) for x in v]
        return v
    inner = next(iter(v.values()))
    if t == "int" and isinstance(inner, str):
        try:
            return int(inner[:32], 10)
        except ValueError:
            return 0
    if t == "array":
        vals = inner.get("values", []) if isinstance(inner, dict) else inner
        return [unwrap_any_value(x) for x in vals]
    if t == "kvlist":
        vals = inner.get("values", []) if isinstance(inner, dict) else inner
        return kvlist_to_map(vals)
    return inner


def kvlist_to_map(entries: list) -> dict:
    """[{key, value}] -> {key: unwrapped value} (converted_kvlist)."""
    out = {}
    for e in entries:
        if isinstance(e, dict) and "key" in e and "value" in e:
            out[e["key"]] = unwrap_any_value(e["value"])
    return out


def _int_of(v: Any) -> int | None:
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, str) and v[:31].isdigit():
        return int(v[:31])
    return None


def parse_otlp_logs(
    body: dict,
    logs_metadata_key: str = "otlp",
    logs_body_key: str | None = None,
) -> list[tuple[int | None, dict, dict]]:
    """One OTLP/JSON logs request -> [(time_unix_nano, metadata,
    record)]."""
    out: list[tuple[int | None, dict, dict]] = []
    for rl in _first(body, "resourceLogs", "resource_logs") or []:
        if not isinstance(rl, dict):
            continue
        for sl in _first(rl, "scopeLogs", "scope_logs") or []:
            if not isinstance(sl, dict):
                continue
            for lr in _first(sl, "logRecords", "log_records") or []:
                if not isinstance(lr, dict):
                    continue
                t = _int_of(_first(
                    lr, "timeUnixNano", "time_unix_nano",
                    "observedTimeUnixNano", "observed_time_unix_nano"))
                meta: dict = {}
                obs = _first(lr, "observedTimeUnixNano",
                             "observed_time_unix_nano")
                # the reference only materializes observed_timestamp
                # for the STRING form (logs.c:514 checks STR type)
                if isinstance(obs, str) and obs.isdigit():
                    meta["observed_timestamp"] = int(obs[:31])
                sevn = _first(lr, "severityNumber", "severity_number")
                if sevn is not None:
                    meta["severity_number"] = sevn
                sevt = _first(lr, "severityText", "severity_text")
                if isinstance(sevt, str):
                    meta["severity_text"] = sevt
                attrs = lr.get("attributes")
                if isinstance(attrs, list):
                    meta["attributes"] = kvlist_to_map(attrs)
                tid = _first(lr, "traceId", "trace_id")
                if isinstance(tid, str):
                    meta["trace_id"] = tid
                sid = _first(lr, "spanId", "span_id")
                if isinstance(sid, str):
                    meta["span_id"] = sid

                rec: dict = {}
                lr_body = lr.get("body")
                if lr_body is not None:
                    unwrapped = unwrap_any_value(lr_body)
                    if _wrapped_type(lr_body) == "kvlist" and \
                            logs_body_key is None:
                        rec = unwrapped if isinstance(unwrapped, dict) \
                            else {"log": unwrapped}
                    elif _wrapped_type(lr_body) is None and \
                            isinstance(unwrapped, dict) and \
                            logs_body_key is None:
                        rec = unwrapped
                    else:
                        rec = {(logs_body_key or "log"): unwrapped}
                out.append((t, {logs_metadata_key: meta}, rec))
    return out


def parse_otlp_logs_df(
    df: DataFrame,
    body_col: str = "body",
    logs_metadata_key: str = "otlp",
    logs_body_key: str | None = None,
) -> DataFrame:
    """DataFrame of OTLP/JSON request bodies -> (time_unix_nano,
    metadata-JSON, record-JSON) rows, Arrow-batched."""
    import pandas as pd

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ts, metas, recs = [], [], []
            for raw in pdf[body_col]:
                if raw is None:
                    continue
                try:
                    doc = json.loads(raw)
                except ValueError:
                    continue
                if not isinstance(doc, dict):
                    continue
                for t, meta, rec in parse_otlp_logs(
                        doc, logs_metadata_key=logs_metadata_key,
                        logs_body_key=logs_body_key):
                    ts.append(t)
                    metas.append(json.dumps(meta, separators=(",", ":")))
                    recs.append(json.dumps(rec, separators=(",", ":")))
            yield pd.DataFrame({
                "time_unix_nano": pd.Series(ts, dtype="object"),
                "metadata": pd.Series(metas, dtype="object"),
                "record": pd.Series(recs, dtype="object"),
            })

    return df.select(body_col).mapInPandas(
        walk, "time_unix_nano long, metadata string, record string")
