"""out_prometheus_remote_write: cmetrics-context -> prompb WriteRequest.

Reference: /root/reference/plugins/out_prometheus_remote_write/
remote_write.c (format_metrics concatenates one encoded blob per
cmetrics context then snappy raw-block compresses, :307-339 + 65-90)
over lib/cmetrics/src/cmt_encode_prometheus_remote_write.c.

Semantics replicated from the C encoder:

- **Family walk order** (cmt_encode_prometheus_remote_write_create
  :1089): counters, gauges, untypeds, summaries, histograms; the
  context sequence_number increments once per family map.
- **Series identity** (set_up_time_series_for_label_set :353): one
  TimeSeries per (sequence_number-seeded hash of the label VALUE
  list); label keys and __name__ are NOT part of the identity, so
  synthetic _count/_sum series only stay separate because of the
  sequence deltas (+10^7 count, +10^8 sum, :29-33); the bucket /
  quantile series reuse the family's base sequence but differ by the
  appended le / quantile caption value. Samples for a repeated label
  set append to the existing series in arrival order.
- **Series labels**: __name__ first, then the context static labels
  (out_prometheus_remote_write `add_label` config, append_labels
  remote_write.c:274), then family label keys in first-seen order
  with the metric's values.
- **Stale cutoff** (check_staled_timestamp :647): a metric whose
  timestamp is more than one hour older than "now" is dropped; the
  comparison is uint64 `now - ts > cutoff`, so a FUTURE timestamp
  underflows and is also dropped. For basic families (counter /
  gauge / untyped, pack_basic_type :658) the first stale metric
  ABORTS the rest of the family while already-packed series are
  kept; for complex families (pack_complex_type :1026) stale
  metrics are skipped individually — except a stale STATIC metric,
  which short-circuits the labeled walk (:1062-1067).
- **Histogram series** (pack_complex_metric_sample :884-1020):
  name_count, name_sum, then one name_bucket series per bound with
  le = "%.17g" of the bound plus a final le="+Inf"; bucket sample
  values are the stored bucket cells (cmt_metric_hist_get_value
  :170), which cmetrics keeps CUMULATIVE — observe increments every
  bucket whose bound >= the value plus +Inf (cmt_histogram.c:334),
  so the wire values are Prometheus-style cumulative counts. The
  engine's bucket_counts column carries those stored cells.
- **Summary series** (:763-880): name_count, name_sum, then one
  series per configured quantile with quantile = "%.17g" caption.
- **No metadata**: CMT_ENCODE_PROMETHEUS_REMOTE_WRITE_ADD_METADATA
  is CMT_FALSE (cmt_encode_prometheus_remote_write.h:27), so the
  WriteRequest carries zero MetricMetadata entries and the
  histogram-metadata hole in pack_metric_metadata (:527, no
  CMT_HISTOGRAM case) is dead code.
- **Timestamps**: nanoseconds / 10^6 -> milliseconds
  (append_metric_to_timeseries :616).

The Spark operator groups long metric rows per flush chunk and
emits one snappy raw-block body per group (applyInPandas; the
python protobuf build is per-group CPU work, so callers repartition
on the group key to spread it — see q_otlp_metrics_encode).
"""

from __future__ import annotations

import json
import struct

from pyspark.sql import DataFrame

from fluent_bit_spark.functions.remote_write import (
    _enc_uvarint,
    _ld,
    snappy_compress,
)

CUTOFF_NS = 3_600_000_000_000  # one hour, cmt_encode_..._write.h:28
_DELTA_COUNT = 10_000_000
_DELTA_SUM = 100_000_000
_KIND_ORDER = {"counter": 0, "gauge": 1, "untyped": 2,
               "summary": 3, "histogram": 4}


def fmt_17g(v: float) -> str:
    """snprintf %.17g — the caption rendering for le / quantile
    label values (0.99 -> '0.98999999999999999', 2.0 -> '2')."""
    return f"{float(v):.17g}"


def _is_stale(ts_ns: int, now_ns: int) -> bool:
    return ((now_ns - ts_ns) & ((1 << 64) - 1)) > CUTOFF_NS


def _series_bytes(labels: list[tuple[str, str]],
                  samples: list[tuple[float, int]]) -> bytes:
    buf = bytearray()
    for name, value in labels:
        buf += _ld(1, _ld(1, name.encode()) + _ld(2, value.encode()))
    for val, ts_ms in samples:
        buf += _ld(2, _enc_uvarint(1 << 3 | 1) + struct.pack("<d", val)
                   + _enc_uvarint(2 << 3 | 0)
                   + _enc_uvarint(ts_ms & ((1 << 64) - 1)))
    return _ld(1, bytes(buf))


def build_write_request(rows: list[dict],
                        static_labels: list[tuple[str, str]] | None = None,
                        now_ns: int = 0) -> bytes:
    """Metric rows (one cmetrics context worth) -> WriteRequest
    protobuf bytes. Row keys: mtype, name, labels (dict), ts (ns),
    value, bucket_counts, explicit_bounds, hist_sum, hist_count,
    quantiles, quantile_values, sum_sum, sum_count."""
    static_labels = list(static_labels or [])
    # families keyed by (kind, name), rows kept in arrival order;
    # rows with an empty label set are the map's static metric and
    # are walked first (pack_basic_type :672, pack_complex_type
    # :1062 process map->metric before map->metrics)
    families: dict[tuple, dict] = {}
    for row in rows:
        fam = families.setdefault(
            (row["mtype"], row["name"]),
            {"keys": [], "static": [], "metrics": []})
        labels = row.get("labels") or {}
        for k in labels:
            if k not in fam["keys"]:
                fam["keys"].append(k)
        (fam["static"] if not labels else fam["metrics"]).append(row)

    # series registry: key -> [labels, samples]; insertion order is
    # the WriteRequest order
    series: dict[tuple, list] = {}

    def emit(seed: int, fqname: str, fam_keys: list[str],
             labels: dict, extra: tuple[str, str] | None,
             value: float, ts_ns: int) -> None:
        values = tuple(labels[k] for k in fam_keys if k in labels)
        if extra is not None:
            values = values + (extra[1],)
        key = (seed, values)
        entry = series.get(key)
        if entry is None:
            lbls = [("__name__", fqname)] + static_labels + [
                (k, labels[k]) for k in fam_keys if k in labels]
            if extra is not None:
                lbls.append(extra)
            entry = series[key] = [lbls, []]
        entry[1].append((float(value), int(ts_ns) // 1_000_000))

    seq = 0
    for kind_rank in range(5):
        for (mtype, name), fam in families.items():
            if _KIND_ORDER.get(mtype, -1) != kind_rank:
                continue
            seq += 1
            keys = fam["keys"]
            walk = fam["static"] + fam["metrics"]
            if mtype in ("counter", "gauge", "untyped"):
                for row in walk:
                    if _is_stale(int(row["ts"]), now_ns):
                        break  # abort rest of family, keep packed
                    emit(seq, name, keys, row.get("labels") or {},
                         None, row.get("value") or 0.0, row["ts"])
            else:
                for row in walk:
                    if _is_stale(int(row["ts"]), now_ns):
                        if not row.get("labels"):
                            break  # stale static short-circuits
                        continue  # labeled: skip this metric only
                    labels = row.get("labels") or {}
                    ts = row["ts"]
                    if mtype == "summary":
                        cnt = row.get("sum_count") or 0
                        tot = row.get("sum_sum") or 0.0
                        qs = row.get("quantiles") or []
                        qv = row.get("quantile_values") or []
                    else:
                        cnt = row.get("hist_count") or 0
                        tot = row.get("hist_sum") or 0.0
                    emit(seq + _DELTA_COUNT, f"{name}_count", keys,
                         labels, None, float(cnt), ts)
                    emit(seq + _DELTA_SUM, f"{name}_sum", keys,
                         labels, None, float(tot), ts)
                    if mtype == "summary":
                        for q, v in zip(qs, qv):
                            emit(seq, name, keys, labels,
                                 ("quantile", fmt_17g(q)), v, ts)
                    else:
                        bounds = list(row.get("explicit_bounds") or [])
                        counts = list(row.get("bucket_counts") or [])
                        caps = [fmt_17g(b) for b in bounds] + ["+Inf"]
                        for cap, c in zip(caps, counts):
                            emit(seq, f"{name}_bucket", keys, labels,
                                 ("le", cap), float(c), ts)
    out = bytearray()
    for lbls, samples in series.values():
        out += _series_bytes(lbls, samples)
    return bytes(out)


def remote_write_export(
    df: DataFrame,
    group_col: str = "chunk",
    static_labels: list[tuple[str, str]] | None = None,
    now_ns: int = 0,
) -> DataFrame:
    """Long metric rows -> one snappy raw-block HTTP body per group
    (the out_prometheus_remote_write POST payload). Input columns
    follow the otlp_metrics_export long shape with ``labels`` as a
    JSON object string; rows are pinned to a deterministic walk
    order (mtype, name, labels, ts) so the payload bytes are stable
    under any shuffle."""
    import pandas as pd

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["mtype", "name", "labels", "ts"],
                              kind="mergesort")
        rows = []
        for r in pdf.itertuples(index=False):
            rows.append({
                "mtype": r.mtype, "name": r.name,
                "labels": json.loads(r.labels) if r.labels else {},
                "ts": int(r.ts),
                "value": r.value,
                "bucket_counts": None if r.bucket_counts is None
                else list(r.bucket_counts),
                "explicit_bounds": None if r.explicit_bounds is None
                else list(r.explicit_bounds),
                "hist_sum": r.hist_sum, "hist_count": r.hist_count,
                "quantiles": None if r.quantiles is None
                else list(r.quantiles),
                "quantile_values": None if r.quantile_values is None
                else list(r.quantile_values),
                "sum_sum": r.sum_sum, "sum_count": r.sum_count,
            })
        body = snappy_compress(
            build_write_request(rows, static_labels, now_ns))
        return pd.DataFrame({group_col: [key[0]], "body": [body]})

    return (
        df.groupBy(group_col)
        .applyInPandas(build, f"{group_col} string, body binary")
    )
