"""OTLP metrics protobuf codec (in_opentelemetry /v1/metrics + out_opentelemetry).

Reference: the reference ingests OTLP metrics by unpacking the
protobuf ExportMetricsServiceRequest and building one cmetrics
context per ScopeMetrics (plugins/in_opentelemetry/
opentelemetry_prot.c:108-145 process_payload_metrics →
lib/cmetrics/src/cmt_decode_opentelemetry.c), and exports metrics by
re-encoding each context as an OTLP MetricsData blob
(plugins/out_opentelemetry/opentelemetry.c:490 process_metrics →
lib/cmetrics/src/cmt_encode_opentelemetry.c).  This module
re-implements both halves over the public OTLP v1 wire format
(field ids confirmed against lib/fluent-otel-proto/proto_c/
opentelemetry/proto/metrics/v1/metrics.pb-c.c) with the same
hand-rolled varint walker the prompb codec uses — no external
protobuf dependency.

Decode semantics kept from cmt_decode_opentelemetry.c:

- one context per ScopeMetrics (decode_scope_metrics_entry :1037);
  resource attributes / dropped count and the two schema_urls are
  attached to every context of the owning ResourceMetrics
  (decode_resource_metrics_entry :1180).
- metric kind dispatch (decode_metrics_entry :829): Sum→counter,
  Gauge→gauge, Summary→summary, Histogram→histogram; an
  ExponentialHistogram or an empty data case is SILENTLY dropped
  (no else branch — result stays success).
- description NULL or empty → ``"-"`` (:845-851); ``unit`` is never
  read by the decoder and is therefore lost (encode emits none).
- label keys are unioned across data points in first-seen order
  (decode_data_point_labels :288); per-sample label values are
  stringified: string/bytes as-is, bool via ``%d`` ("1"/"0"),
  int via PRIi64, double via ``%.17g``; kvlist/array/absent cases
  append a NULL label value (:368-396); an attribute whose AnyValue
  is missing appends NOTHING (:366 ``continue``), compacting the
  value list — later keys pair with earlier value slots.  More than
  127 attributes on one data point rejects the WHOLE payload
  (:312-314 → plugin drops the chunk).
- NumberDataPoint (decode_numerical_data_point :402): as_int < 0
  clamps to 0, missing value case reads 0; a point with zero
  attributes becomes the map's single STATIC sample (first one
  only — later zero-attribute points become list samples with an
  empty label set).
- counter extras (decode_counter_entry :718): aggregation
  temporality delta/cumulative/else-unspecified; allow_reset =
  !is_monotonic.
- histogram (decode_histogram_data_point :608): a data point with
  n_bucket_counts > n_explicit_bounds + 1 rejects the payload; the
  bucket boundary list is fixed by the FIRST data point of the
  metric; per-sample bucket counts / sum / count are kept.
- summary (decode_summary_data_point :491): the quantile list is
  fixed by the FIRST data point; per-sample quantile values / sum /
  count are kept.

Encode semantics kept from cmt_encode_opentelemetry.c:

- one MetricsData{ResourceMetrics[1]{ScopeMetrics[1]}} per context
  (initialize_opentelemetry_context :2143); MetricsData and
  ExportMetricsServiceRequest share the wire layout (repeated
  ResourceMetrics at field 1), which is how the engine's own
  decoder re-ingests the export.
- metric order is BY TYPE: counters, gauges, untyped, summaries,
  histograms (cmt_encode_opentelemetry_create :2539-2583) — a
  round-trip reorders mixed payloads.
- the static sample is emitted first, then list samples
  (pack_basic_type :2441-2470).
- numerical points always encode as_double with
  start_time_unix_nano = 0 (append_sample_to_metric :2272-2284,
  initialize_numerical_data_point :1433-1436).
- only counters carry temporality/monotonicity; every other type
  encodes AGGREGATION_TEMPORALITY_UNSPECIFIED — histogram
  temporality does NOT survive a round-trip (pack_basic_type
  :2410-2425 computes the values only for CMT_COUNTER).
- histogram sum is always serialized (the protobuf-c synthetic
  oneof note at :1597-1620); bucket counts are emitted for
  len(bounds)+1 slots (:2298-2306), shorter sample lists padded
  with zeros (the C reads the sample's calloc'd buffer).
"""

from __future__ import annotations

import json
import struct
from typing import Iterator

from .remote_write import _enc_uvarint, _fields, _ld, _uvarint

__all__ = [
    "decode_metrics_payload",
    "encode_metrics_payload",
    "parse_otlp_metrics_df",
    "otlp_metrics_export",
    "METRIC_ROW_SCHEMA",
]


class OtlpMetricsDecodeError(ValueError):
    """Payload-level rejection (the plugin drops the whole chunk)."""


# ------------------------------------------------------------ AnyValue


def _decode_any_value(buf: bytes):
    """AnyValue message -> python value (clone_variant :46-116)."""
    out = None
    for field, wt, v in _fields(buf):
        if field == 1 and wt == 2:  # string_value
            out = v.decode("utf-8", "replace")
        elif field == 2 and wt == 0:  # bool_value
            out = bool(v)
        elif field == 3 and wt == 0:  # int_value (varint, zigzag-less)
            out = v - (1 << 64) if v >= 1 << 63 else v
        elif field == 4 and wt == 1:  # double_value
            (out,) = struct.unpack("<d", v)
        elif field == 5 and wt == 2:  # array_value
            out = [
                _decode_any_value(e)
                for f2, w2, e in _fields(v)
                if f2 == 1 and w2 == 2
            ]
        elif field == 6 and wt == 2:  # kvlist_value
            out = _decode_kvlist(v)
        elif field == 7 and wt == 2:  # bytes_value
            out = v.decode("utf-8", "replace")
    return out


def _decode_kvlist(buf: bytes) -> dict:
    out: dict = {}
    for field, wt, v in _fields(buf):
        if field == 1 and wt == 2:  # KeyValue
            key, val = None, None
            for f2, w2, v2 in _fields(v):
                if f2 == 1 and w2 == 2:
                    key = v2.decode("utf-8", "replace")
                elif f2 == 2 and w2 == 2:
                    val = _decode_any_value(v2)
            if key is not None:
                out[key] = val
    return out


def _encode_any_value(value) -> bytes:
    """python value -> AnyValue bytes (cfl_variant_to_otlp_any_value)."""
    if isinstance(value, bool):
        return _enc_uvarint(2 << 3 | 0) + _enc_uvarint(1 if value else 0)
    if isinstance(value, int):
        return _enc_uvarint(3 << 3 | 0) + _enc_uvarint(value & ((1 << 64) - 1))
    if isinstance(value, float):
        return _enc_uvarint(4 << 3 | 1) + struct.pack("<d", value)
    if isinstance(value, bytes):
        return _ld(7, value)
    if isinstance(value, list):
        body = b"".join(_ld(1, _encode_any_value(e)) for e in value)
        return _ld(5, body)
    if isinstance(value, dict):
        return _ld(6, _encode_kvlist(value))
    if value is None:
        return b""
    return _ld(1, str(value).encode("utf-8"))


def _encode_kvlist(d: dict) -> bytes:
    return b"".join(_ld(1, _encode_keyvalue(k, v)) for k, v in d.items())


def _encode_keyvalue(key: str, value) -> bytes:
    return _ld(1, key.encode("utf-8")) + _ld(2, _encode_any_value(value))


# ------------------------------------------------------------- decode


def _stringify_label(raw: bytes):
    """Raw AnyValue -> (present, value-or-None) per
    decode_data_point_labels :366-396."""
    kind, payload = None, None
    for field, wt, v in _fields(raw):
        kind, payload = (field, wt), v
    if kind is None:
        return None  # empty AnyValue: treated like the kvlist branch
    field, wt = kind
    if field == 1 and wt == 2:  # string
        return payload.decode("utf-8", "replace")
    if field == 7 and wt == 2:  # bytes, kept verbatim
        return payload.decode("utf-8", "replace")
    if field == 2 and wt == 0:  # bool -> %d
        return "1" if payload else "0"
    if field == 3 and wt == 0:  # int -> PRIi64
        iv = payload - (1 << 64) if payload >= 1 << 63 else payload
        return str(iv)
    if field == 4 and wt == 1:  # double -> %.17g
        (dv,) = struct.unpack("<d", payload)
        return "%.17g" % dv
    return None  # kvlist / array -> NULL label value


def _point_labels(metric: dict, attrs: list) -> list:
    """Union attribute keys into the metric's label_keys (first-seen
    order) and build this sample's compacted value list."""
    if len(attrs) > 127:
        raise OtlpMetricsDecodeError("more than 127 data point attributes")
    keys = metric["label_keys"]
    slot: dict[int, bytes | None] = {}
    for key, raw_value in attrs:
        try:
            idx = keys.index(key)
        except ValueError:
            idx = len(keys)
            keys.append(key)
        slot[idx] = raw_value
    values = []
    for idx in range(len(keys)):
        if idx not in slot:
            continue
        raw = slot[idx]
        if raw is None:  # attribute without AnyValue: appends nothing
            continue
        values.append(_stringify_label(raw))
    return values


def _decode_attr_pairs(buf: bytes, field_id: int) -> tuple[list, dict]:
    """Collect (key, raw AnyValue bytes) attribute pairs plus the
    scalar fields of a data point message."""
    attrs: list = []
    scalars: dict = {}
    packed: dict = {}
    for field, wt, v in _fields(buf):
        if field == field_id and wt == 2:
            key, raw = "", None
            for f2, w2, v2 in _fields(v):
                if f2 == 1 and w2 == 2:
                    key = v2.decode("utf-8", "replace")
                elif f2 == 2 and w2 == 2:
                    raw = v2
            attrs.append((key, raw))
        else:
            packed.setdefault((field, wt), []).append(v)
    scalars["_packed"] = packed
    return attrs, scalars


def _fixed64(packed: dict, field: int, default: int = 0) -> int:
    vals = packed.get((field, 1))
    if not vals:
        return default
    return struct.unpack("<Q", vals[-1])[0]


def _double(packed: dict, field: int, default: float = 0.0) -> float:
    vals = packed.get((field, 1))
    if not vals:
        return default
    return struct.unpack("<d", vals[-1])[0]


def _rep_fixed64(packed: dict, field: int) -> list[int]:
    out: list[int] = []
    for raw in packed.get((field, 2), []):  # packed encoding
        out.extend(
            struct.unpack(f"<{len(raw) // 8}Q", raw[: len(raw) // 8 * 8])
        )
    for raw in packed.get((field, 1), []):  # unpacked encoding
        out.append(struct.unpack("<Q", raw)[0])
    return out


def _rep_double(packed: dict, field: int) -> list[float]:
    out: list[float] = []
    for raw in packed.get((field, 2), []):
        out.extend(
            struct.unpack(f"<{len(raw) // 8}d", raw[: len(raw) // 8 * 8])
        )
    for raw in packed.get((field, 1), []):
        out.append(struct.unpack("<d", raw)[0])
    return out


def _new_metric(name: str, description: str) -> dict:
    if not description:
        description = "-"  # decode_metrics_entry :845-851
    return {
        "name": name,
        "description": description,
        "label_keys": [],
        "static_sample": None,
        "samples": [],
        "static_set": False,
    }


def _attach_sample(metric: dict, attrs: list, sample: dict) -> dict:
    """Static-sample bookkeeping per decode_numerical_data_point
    :402-440: the first zero-attribute point IS the static sample."""
    if not attrs and not metric["static_set"]:
        metric["static_set"] = True
        sample["label_values"] = []
        metric["static_sample"] = sample
        return sample
    sample["label_values"] = _point_labels(metric, attrs)
    metric["samples"].append(sample)
    return sample


def _decode_number_points(metric: dict, buf: bytes) -> None:
    for field, wt, v in _fields(buf):
        if field != 1 or wt != 2:
            continue
        attrs, sc = _decode_attr_pairs(v, 7)
        packed = sc["_packed"]
        value = 0.0
        # oneof: last of as_double(4)/as_int(6) wins
        case = None
        for f, w, raw in _fields(v):
            if f == 4 and w == 1:
                case = ("d", struct.unpack("<d", raw)[0])
            elif f == 6 and w == 1:
                iv = struct.unpack("<q", raw)[0]
                case = ("i", iv)
        if case is not None:
            if case[0] == "i":
                value = 0.0 if case[1] < 0 else float(case[1])
            else:
                value = case[1]
        sample = {"ts": _fixed64(packed, 3), "value": value}
        _attach_sample(metric, attrs, sample)


def _decode_histogram_points(metric: dict, buf: bytes) -> None:
    for field, wt, v in _fields(buf):
        if field != 1 or wt != 2:
            continue
        attrs, sc = _decode_attr_pairs(v, 9)
        packed = sc["_packed"]
        bucket_counts = _rep_fixed64(packed, 6)
        bounds = _rep_double(packed, 7)
        if len(bucket_counts) > len(bounds) + 1:
            raise OtlpMetricsDecodeError(
                "histogram bucket count exceeds bounds+1"
            )
        if metric.get("bounds") is None:
            metric["bounds"] = bounds  # fixed by the first point
        sample = {
            "ts": _fixed64(packed, 3),
            "bucket_counts": bucket_counts,
            "sum": _double(packed, 5),
            "count": _fixed64(packed, 4),
        }
        _attach_sample(metric, attrs, sample)


def _decode_summary_points(metric: dict, buf: bytes) -> None:
    for field, wt, v in _fields(buf):
        if field != 1 or wt != 2:
            continue
        attrs, sc = _decode_attr_pairs(v, 7)
        packed = sc["_packed"]
        quantiles: list[float] = []
        values: list[float] = []
        for f2, w2, v2 in _fields(v):
            if f2 == 6 and w2 == 2:  # ValueAtQuantile
                q = val = 0.0
                for f3, w3, v3 in _fields(v2):
                    if f3 == 1 and w3 == 1:
                        (q,) = struct.unpack("<d", v3)
                    elif f3 == 2 and w3 == 1:
                        (val,) = struct.unpack("<d", v3)
                quantiles.append(q)
                values.append(val)
        if metric.get("quantiles") is None:
            metric["quantiles"] = quantiles  # fixed by the first point
        sample = {
            "ts": _fixed64(packed, 3),
            "quantile_values": values,
            "sum": _double(packed, 5),
            "count": _fixed64(packed, 4),
        }
        _attach_sample(metric, attrs, sample)


_TEMPORALITY = {1: "delta", 2: "cumulative"}


def _decode_metric(buf: bytes, ctx: dict) -> None:
    name = description = ""
    data_case = None  # (kind, payload); last one wins (protobuf oneof)
    for field, wt, v in _fields(buf):
        if field == 1 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif field == 2 and wt == 2:
            description = v.decode("utf-8", "replace")
        elif field == 7 and wt == 2:
            data_case = ("sum", v)
        elif field == 5 and wt == 2:
            data_case = ("gauge", v)
        elif field == 11 and wt == 2:
            data_case = ("summary", v)
        elif field == 9 and wt == 2:
            data_case = ("histogram", v)
        # field 10 (exponential histogram) intentionally not matched:
        # decode_metrics_entry has no branch for it -> metric dropped
    if data_case is None:
        return
    kind, payload = data_case
    metric = _new_metric(name, description)
    if kind == "sum":
        temporality = 0
        monotonic = False
        for f, w, v in _fields(payload):
            if f == 2 and w == 0:
                temporality = v
            elif f == 3 and w == 0:
                monotonic = bool(v)
        _decode_number_points(metric, payload)
        metric["temporality"] = _TEMPORALITY.get(temporality, "unspecified")
        metric["allow_reset"] = not monotonic
        ctx["counters"].append(metric)
    elif kind == "gauge":
        _decode_number_points(metric, payload)
        ctx["gauges"].append(metric)
    elif kind == "summary":
        metric["quantiles"] = None
        _decode_summary_points(metric, payload)
        ctx["summaries"].append(metric)
    else:
        metric["bounds"] = None
        temporality = 0
        for f, w, v in _fields(payload):
            if f == 2 and w == 0:
                temporality = v
        _decode_histogram_points(metric, payload)
        # decode_histogram_entry :797 stores the temporality on the
        # cmt histogram; re-encode still drops it (counter-only in
        # pack_basic_type) — kept here for row-level parity.
        metric["temporality"] = _TEMPORALITY.get(temporality, "unspecified")
        ctx["histograms"].append(metric)


def _decode_scope(buf: bytes) -> dict:
    out = {"name": None, "version": None, "dropped": 0, "attrs": {}}
    for field, wt, v in _fields(buf):
        if field == 1 and wt == 2:
            out["name"] = v.decode("utf-8", "replace")
        elif field == 2 and wt == 2:
            out["version"] = v.decode("utf-8", "replace")
        elif field == 3 and wt == 2:
            key, val = None, None
            for f2, w2, v2 in _fields(v):
                if f2 == 1 and w2 == 2:
                    key = v2.decode("utf-8", "replace")
                elif f2 == 2 and w2 == 2:
                    val = _decode_any_value(v2)
            if key is not None:
                out["attrs"][key] = val
        elif field == 4 and wt == 0:
            out["dropped"] = v
    return out


def decode_metrics_payload(buf: bytes) -> list[dict]:
    """ExportMetricsServiceRequest / MetricsData bytes -> one context
    dict per ScopeMetrics.  Raises OtlpMetricsDecodeError on the
    payload-level rejections the reference enforces (the caller drops
    the whole chunk, opentelemetry_prot.c:127)."""
    contexts: list[dict] = []
    for field, wt, rm in _fields(buf):
        if field != 1 or wt != 2:
            continue
        resource_attrs: dict = {}
        resource_dropped = 0
        resource_schema = None
        rm_contexts: list[dict] = []
        for f2, w2, v2 in _fields(rm):
            if f2 == 1 and w2 == 2:  # Resource
                for f3, w3, v3 in _fields(v2):
                    if f3 == 1 and w3 == 2:
                        key, val = None, None
                        for f4, w4, v4 in _fields(v3):
                            if f4 == 1 and w4 == 2:
                                key = v4.decode("utf-8", "replace")
                            elif f4 == 2 and w4 == 2:
                                val = _decode_any_value(v4)
                        if key is not None:
                            resource_attrs[key] = val
                    elif f3 == 2 and w3 == 0:
                        resource_dropped = v3
            elif f2 == 3 and w2 == 2:
                resource_schema = v2.decode("utf-8", "replace")
            elif f2 == 2 and w2 == 2:  # ScopeMetrics -> one context
                ctx = {
                    "counters": [],
                    "gauges": [],
                    "untyped": [],
                    "summaries": [],
                    "histograms": [],
                    "scope": {
                        "name": None,
                        "version": None,
                        "dropped": 0,
                        "attrs": {},
                    },
                    "scope_schema_url": None,
                }
                for f3, w3, v3 in _fields(v2):
                    if f3 == 1 and w3 == 2:
                        ctx["scope"] = _decode_scope(v3)
                    elif f3 == 2 and w3 == 2:
                        _decode_metric(v3, ctx)
                    elif f3 == 3 and w3 == 2:
                        ctx["scope_schema_url"] = v3.decode(
                            "utf-8", "replace"
                        )
                rm_contexts.append(ctx)
        for ctx in rm_contexts:
            ctx["resource_attrs"] = resource_attrs
            ctx["resource_dropped"] = resource_dropped
            ctx["resource_schema_url"] = resource_schema
        contexts.extend(rm_contexts)
    return contexts


# ------------------------------------------------------------- encode


def _enc_number_point(ts: int, value: float, labels: list) -> bytes:
    # initialize_numerical_data_point :1433-1439: start_time 0 (proto3
    # default, omitted on the wire), always as_double.
    out = bytearray()
    if ts:
        out += _enc_uvarint(3 << 3 | 1) + struct.pack("<Q", ts)
    out += _enc_uvarint(4 << 3 | 1) + struct.pack("<d", value)
    for key, val in labels:
        out += _ld(7, _enc_string_attribute(key, val))
    return bytes(out)


def _enc_string_attribute(key: str, value) -> bytes:
    body = _ld(1, (key or "").encode("utf-8"))
    if value is not None:
        body += _ld(2, _ld(1, str(value).encode("utf-8")))
    else:
        body += _ld(2, b"")  # NULL label caption -> empty AnyValue
    return body


def _enc_histogram_point(
    ts: int,
    count: int,
    total: float,
    bucket_counts: list[int],
    bounds: list[float],
    labels: list,
) -> bytes:
    out = bytearray()
    if ts:
        out += _enc_uvarint(3 << 3 | 1) + struct.pack("<Q", ts)
    if count:
        out += _enc_uvarint(4 << 3 | 1) + struct.pack("<Q", count)
    # the synthetic-oneof note (:1597-1620): sum is ALWAYS serialized
    out += _enc_uvarint(5 << 3 | 1) + struct.pack("<d", total)
    slots = len(bounds) + 1  # :2298-2306 buckets->count + 1
    padded = (list(bucket_counts) + [0] * slots)[:slots]
    if padded:
        out += _ld(6, struct.pack(f"<{len(padded)}Q", *padded))
    if bounds:
        out += _ld(7, struct.pack(f"<{len(bounds)}d", *bounds))
    for key, val in labels:
        out += _ld(9, _enc_string_attribute(key, val))
    return bytes(out)


def _enc_summary_point(
    ts: int,
    count: int,
    total: float,
    quantiles: list[float],
    values: list[float],
    labels: list,
) -> bytes:
    out = bytearray()
    if ts:
        out += _enc_uvarint(3 << 3 | 1) + struct.pack("<Q", ts)
    if count:
        out += _enc_uvarint(4 << 3 | 1) + struct.pack("<Q", count)
    if total:
        out += _enc_uvarint(5 << 3 | 1) + struct.pack("<d", total)
    for q, v in zip(quantiles, values):
        body = (
            _enc_uvarint(1 << 3 | 1)
            + struct.pack("<d", q)
            + _enc_uvarint(2 << 3 | 1)
            + struct.pack("<d", v)
        )
        out += _ld(6, body)
    for key, val in labels:
        out += _ld(7, _enc_string_attribute(key, val))
    return bytes(out)


_TEMPORALITY_ENC = {"delta": 1, "cumulative": 2}


def _sample_labels(metric: dict, sample: dict,
                   static_labels: list = ()) -> list:
    # append_sample_to_metric :2343-2372: label_keys walked in order,
    # zipped against the sample's (possibly shorter) value list; the
    # context STATIC labels (cmt_label_add) lead every point's
    # attribute list in the C output (observed byte-level against the
    # compiled reference encoder).
    return list(static_labels) + list(
        zip(metric["label_keys"], sample["label_values"]))


def _enc_metric(metric: dict, kind: str,
                static_labels: list = ()) -> bytes:
    body = _ld(1, metric["name"].encode("utf-8"))
    if metric.get("description"):
        body += _ld(2, metric["description"].encode("utf-8"))
    samples = []
    if metric.get("static_set") and metric.get("static_sample") is not None:
        samples.append(metric["static_sample"])
    samples.extend(metric["samples"])
    inner = bytearray()
    if kind in ("counter", "gauge", "untyped"):
        for s in samples:
            inner_pt = _enc_number_point(
                s["ts"], s["value"], _sample_labels(metric, s, static_labels)
            )
            inner += _ld(1, inner_pt)
        if kind == "counter":
            temporality = _TEMPORALITY_ENC.get(metric.get("temporality"), 0)
            if temporality:
                inner += _enc_uvarint(2 << 3 | 0) + _enc_uvarint(temporality)
            if not metric.get("allow_reset", False):
                inner += _enc_uvarint(3 << 3 | 0) + _enc_uvarint(1)
            return body + _ld(7, bytes(inner))
        return body + _ld(5, bytes(inner))
    if kind == "summary":
        quantiles = metric.get("quantiles") or []
        for s in samples:
            inner += _ld(
                1,
                _enc_summary_point(
                    s["ts"],
                    s["count"],
                    s["sum"],
                    quantiles,
                    s["quantile_values"],
                    _sample_labels(metric, s, static_labels),
                ),
            )
        return body + _ld(11, bytes(inner))
    # histogram: temporality encoded as UNSPECIFIED (0, omitted) for
    # every non-counter type (pack_basic_type :2410-2425).
    bounds = metric.get("bounds") or []
    for s in samples:
        inner += _ld(
            1,
            _enc_histogram_point(
                s["ts"],
                s["count"],
                s["sum"],
                s["bucket_counts"],
                bounds,
                _sample_labels(metric, s, static_labels),
            ),
        )
    return body + _ld(9, bytes(inner))


def encode_metrics_payload(ctx: dict) -> bytes:
    """Context dict -> MetricsData bytes (one ResourceMetrics with one
    ScopeMetrics, metrics ordered counters/gauges/untyped/summaries/
    histograms)."""
    metrics = bytearray()
    static_labels = [tuple(p) for p in ctx.get("static_labels") or []]
    for kind, key in (
        ("counter", "counters"),
        ("gauge", "gauges"),
        ("untyped", "untyped"),
        ("summary", "summaries"),
        ("histogram", "histograms"),
    ):
        for metric in ctx.get(key, []):
            has_samples = metric.get("static_set") or metric["samples"]
            if not has_samples:  # pack_basic_type :2405-2408
                continue
            metrics += _ld(2, _enc_metric(metric, kind,
                                          static_labels))
    scope = ctx.get("scope") or {}
    scope_body = bytearray()
    if scope.get("name"):
        scope_body += _ld(1, scope["name"].encode("utf-8"))
    if scope.get("version"):
        scope_body += _ld(2, scope["version"].encode("utf-8"))
    for k, v in (scope.get("attrs") or {}).items():
        scope_body += _ld(3, _encode_keyvalue(k, v))
    if scope.get("dropped"):
        scope_body += _enc_uvarint(4 << 3 | 0) + _enc_uvarint(scope["dropped"])
    # protobuf-c omits empty submessages: no scope/resource field at
    # all when nothing is set (byte-matched against the compiled
    # reference encoder)
    scope_metrics = (_ld(1, bytes(scope_body)) if scope_body else b"") \
        + bytes(metrics)
    if ctx.get("scope_schema_url"):
        scope_metrics += _ld(3, ctx["scope_schema_url"].encode("utf-8"))
    resource = bytearray()
    for k, v in (ctx.get("resource_attrs") or {}).items():
        resource += _ld(1, _encode_keyvalue(k, v))
    if ctx.get("resource_dropped"):
        resource += _enc_uvarint(2 << 3 | 0) + _enc_uvarint(
            ctx["resource_dropped"]
        )
    rm = (_ld(1, bytes(resource)) if resource else b"") \
        + _ld(2, scope_metrics)
    if ctx.get("resource_schema_url"):
        rm += _ld(3, ctx["resource_schema_url"].encode("utf-8"))
    return _ld(1, rm)


# ------------------------------------------------------- spark surface

METRIC_ROW_SCHEMA = (
    "ctx_id int, mtype string, name string, description string, "
    "temporality string, allow_reset boolean, labels string, ts long, "
    "value double, bucket_counts array<long>, explicit_bounds "
    "array<double>, hist_sum double, hist_count long, quantiles "
    "array<double>, quantile_values array<double>, sum_sum double, "
    "sum_count long, scope_name string, scope_version string, "
    "resource_attrs string, scope_attrs string, resource_schema_url "
    "string, scope_schema_url string"
)


def _labels_json(metric: dict, sample: dict) -> str:
    return json.dumps(
        dict(zip(metric["label_keys"], sample["label_values"])),
        sort_keys=True,
        separators=(",", ":"),
    )


def _context_rows(ctx: dict, ctx_id: int) -> Iterator[dict]:
    base = {
        "ctx_id": ctx_id,
        "scope_name": ctx["scope"].get("name"),
        "scope_version": ctx["scope"].get("version"),
        "resource_attrs": json.dumps(
            ctx.get("resource_attrs") or {}, sort_keys=True,
            separators=(",", ":"),
        ),
        "scope_attrs": json.dumps(
            ctx["scope"].get("attrs") or {}, sort_keys=True,
            separators=(",", ":"),
        ),
        "resource_schema_url": ctx.get("resource_schema_url"),
        "scope_schema_url": ctx.get("scope_schema_url"),
    }
    for kind, key in (
        ("counter", "counters"),
        ("gauge", "gauges"),
        ("summary", "summaries"),
        ("histogram", "histograms"),
    ):
        for metric in ctx[key]:
            samples = []
            if metric["static_set"] and metric["static_sample"] is not None:
                samples.append(metric["static_sample"])
            samples.extend(metric["samples"])
            for s in samples:
                row = dict(
                    base,
                    mtype=kind,
                    name=metric["name"],
                    description=metric["description"],
                    temporality=metric.get("temporality"),
                    allow_reset=metric.get("allow_reset"),
                    labels=_labels_json(metric, s),
                    ts=s["ts"],
                    value=s.get("value"),
                    bucket_counts=s.get("bucket_counts"),
                    explicit_bounds=metric.get("bounds"),
                    hist_sum=s.get("sum") if kind == "histogram" else None,
                    hist_count=s.get("count") if kind == "histogram" else None,
                    quantiles=metric.get("quantiles"),
                    quantile_values=s.get("quantile_values"),
                    sum_sum=s.get("sum") if kind == "summary" else None,
                    sum_count=s.get("count") if kind == "summary" else None,
                )
                yield row


def parse_otlp_metrics_df(df, data_col: str = "data"):
    """DataFrame with a binary OTLP metrics payload column -> long
    sample rows (one per data point), Arrow-batched; a payload the
    reference would reject yields zero rows (the plugin logs and
    drops the chunk, opentelemetry_prot.c:127)."""
    import pandas as pd
    from pyspark.sql.types import StructType

    cols = [f.name for f in StructType.fromDDL(METRIC_ROW_SCHEMA).fields]

    def walk(batches):
        for pdf in batches:
            rows: list[dict] = []
            for payload in pdf[data_col]:
                if payload is None:
                    continue
                try:
                    contexts = decode_metrics_payload(bytes(payload))
                except (OtlpMetricsDecodeError, ValueError, struct.error):
                    continue  # whole chunk dropped
                for ctx_id, ctx in enumerate(contexts):
                    rows.extend(_context_rows(ctx, ctx_id))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(walk, METRIC_ROW_SCHEMA)


def otlp_metrics_export(df, group_col: str = "tag"):
    """Long metric rows -> one OTLP MetricsData payload per group
    (out_opentelemetry process_metrics: one encoded blob per cmetrics
    context, concatenated per chunk).  Input rows use the
    parse_otlp_metrics_df column names; metrics are rebuilt in row
    order within their type family."""
    import pandas as pd

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ctx: dict = {
            "counters": [],
            "gauges": [],
            "untyped": [],
            "summaries": [],
            "histograms": [],
            "scope": {
                "name": None, "version": None, "dropped": 0, "attrs": {},
            },
            "scope_schema_url": None,
            "resource_attrs": {},
            "resource_dropped": 0,
            "resource_schema_url": None,
        }
        key_of = {"counter": "counters", "gauge": "gauges",
                  "summary": "summaries", "histogram": "histograms"}
        metrics: dict[tuple, dict] = {}
        # group rows arrive in shuffle order; pin a deterministic
        # build order so the payload bytes are stable at any scale
        pdf = pdf.sort_values(
            ["mtype", "name", "ts", "labels"], kind="mergesort"
        )
        for row in pdf.itertuples(index=False):
            kind = row.mtype
            mkey = (kind, row.name)
            metric = metrics.get(mkey)
            if metric is None:
                metric = _new_metric(row.name, row.description or "")
                if kind == "counter":
                    metric["temporality"] = row.temporality or "unspecified"
                    metric["allow_reset"] = bool(row.allow_reset)
                if kind == "histogram":
                    metric["bounds"] = (
                        list(row.explicit_bounds)
                        if row.explicit_bounds is not None else []
                    )
                if kind == "summary":
                    metric["quantiles"] = (
                        list(row.quantiles)
                        if row.quantiles is not None else []
                    )
                metrics[mkey] = metric
                ctx[key_of[kind]].append(metric)
            labels = json.loads(row.labels) if row.labels else {}
            sample: dict = {"ts": int(row.ts) if row.ts is not None else 0}
            if kind in ("counter", "gauge"):
                sample["value"] = float(row.value or 0.0)
            elif kind == "histogram":
                buckets = row.bucket_counts
                sample["bucket_counts"] = (
                    [int(b) for b in buckets] if buckets is not None else []
                )
                sample["sum"] = float(row.hist_sum or 0.0)
                sample["count"] = int(row.hist_count or 0)
            else:
                qv = row.quantile_values
                sample["quantile_values"] = (
                    [float(v) for v in qv] if qv is not None else []
                )
                sample["sum"] = float(row.sum_sum or 0.0)
                sample["count"] = int(row.sum_count or 0)
            if not labels and not metric["static_set"]:
                metric["static_set"] = True
                sample["label_values"] = []
                metric["static_sample"] = sample
            else:
                for k in labels:
                    if k not in metric["label_keys"]:
                        metric["label_keys"].append(k)
                sample["label_values"] = [
                    labels[k] for k in metric["label_keys"] if k in labels
                ]
                metric["samples"].append(sample)
        payload = encode_metrics_payload(ctx)
        return pd.DataFrame(
            {group_col: [key[0]], "payload": [payload]}
        )

    return (
        df.groupBy(group_col)
        .applyInPandas(build, f"{group_col} string, payload binary")
    )
