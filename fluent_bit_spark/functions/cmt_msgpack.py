"""cmetrics msgpack context codec — the forward-protocol metrics wire.

Reference: lib/cmetrics/src/cmt_encode_msgpack.c and
cmt_decode_msgpack.c. This is the serialization fluent-bit uses for
METRICS events between its own instances (in_fluentbit_metrics →
out_forward → in_forward) and inside buffer chunks.

Wire shape (pack_context :428): a 2-key map
``{"meta": {...}, "metrics": [...]}`` where the context meta holds
the "cmetrics" internal kvlist (empty at context creation,
cmetrics.c:57), the "external" kvlist and
``processing.static_labels`` as [key, value] pairs (:300-371). Each
metric family (walk order counters → gauges → untypeds → summaries
→ histograms, :373-420) is a 2-key map ``{"meta": ..., "values":
...}``:

- family meta (pack_header :51): ver=2 (cmt_encode_msgpack.h:26),
  numeric type (cmetrics.h:26-30), opts {ns, ss, name, desc},
  label-key array, plus exactly one type-specific key — histogram
  bucket BOUNDS, summary quantiles (doubles), or the counter
  aggregation_type int. Gauges/untypeds have only the 4 base keys.
- values (pack_basic_type :283): the static (label-less) metric
  first when set, then labeled metrics. Each value map (pack_metric
  :167) is ts, then ONE of value / histogram{buckets RAW counts
  incl +Inf, sum double, count uint} / summary{quantiles_set,
  quantiles as RAW IEEE-754 uint64 BIT PATTERNS, count uint, sum as
  RAW BITS too — the summary branch packs the uint storage directly
  (:224-236) while the histogram branch converts sum to double
  (:207) — kept bug-compatible}, then the label-value array (only
  when non-empty), then "hash".
- hash: XXH3-64 over fqname + label values ("_NULL_" for NULL,
  cmt_map.c:199-216); the STATIC metric's hash is 0 — map->metric
  is zero-initialized and the labels_count==0 path never hashes
  (cmt_map.c:183-200).
- fqname (cmt_opts.c:41-78): ns + "_" when ns nonempty, + ss + "_"
  when ss nonempty, + name.

The Spark operators mirror the other wire codecs: one context blob
per flush-chunk group on the encode side (applyInPandas over an
explicit hash repartition), an Arrow mapInPandas walk on the decode
side.
"""

from __future__ import annotations

import json
import struct
from typing import Iterator

from pyspark.sql import DataFrame

from fluent_bit_spark.functions.xxh3 import xxh3_64
from fluent_bit_spark.wasm.mpack import packb, unpackb

_TYPE_NUM = {"counter": 0, "gauge": 1, "histogram": 2, "summary": 3,
             "untyped": 4}
_TYPE_NAME = {v: k for k, v in _TYPE_NUM.items()}
_KIND_ORDER = ["counter", "gauge", "untyped", "summary", "histogram"]


def fqname(ns: str, ss: str, name: str) -> str:
    out = ns or ""
    if out:
        out += "_"
    if ss:
        out += ss
        if not out.endswith("_"):
            out += "_"
    return out + name


def _d64_bits(v: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", float(v)))[0]


def _bits_d64(u: int) -> float:
    return struct.unpack("<d", struct.pack("<Q", u & (1 << 64) - 1))[0]


def metric_hash(fq: str, label_values: list) -> int:
    buf = fq.encode()
    for v in label_values:
        buf += b"_NULL_" if v is None else str(v).encode()
    return xxh3_64(buf)


def encode_cmt_context(families: list[dict],
                       static_labels: list[tuple[str, str]] | None = None
                       ) -> bytes:
    """families: [{type, ns, ss, name, desc, label_keys, values,
    buckets? quantiles? aggregation_type?}]; values: [{ts, labels
    (value list, [] = static), value | buckets/sum/count |
    quantiles_set/quantile_values/count/sum}]."""
    metrics = []
    by_kind = {k: [] for k in _KIND_ORDER}
    for fam in families:
        by_kind[fam["type"]].append(fam)
    for kind in _KIND_ORDER:
        for fam in by_kind[kind]:
            fq = fqname(fam.get("ns", ""), fam.get("ss", ""),
                        fam["name"])
            meta = {
                "ver": 2,
                "type": _TYPE_NUM[kind],
                "opts": {"ns": fam.get("ns", ""),
                         "ss": fam.get("ss", ""),
                         "name": fam["name"],
                         "desc": fam.get("desc", "")},
                "labels": list(fam.get("label_keys") or []),
            }
            if kind == "histogram":
                meta["buckets"] = [float(b)
                                   for b in fam.get("buckets") or []]
            elif kind == "summary":
                meta["quantiles"] = [float(q)
                                     for q in fam.get("quantiles") or []]
            elif kind == "counter":
                meta["aggregation_type"] = int(
                    fam.get("aggregation_type", 0))
            values = []
            # static metric first (pack_basic_type :295-300)
            walk = sorted(fam["values"],
                          key=lambda m: bool(m.get("labels")))
            for m in walk:
                labels = list(m.get("labels") or [])
                vm: dict = {"ts": int(m["ts"])}
                if kind == "histogram":
                    vm["histogram"] = {
                        "buckets": [int(c) for c in m.get("buckets") or []],
                        "sum": float(m.get("sum") or 0.0),
                        "count": int(m.get("count") or 0),
                    }
                elif kind == "summary":
                    vm["summary"] = {
                        "quantiles_set": int(m.get("quantiles_set", 1)),
                        # RAW d64 bit patterns (:224-236)
                        "quantiles": [_d64_bits(v) for v in
                                      m.get("quantile_values") or []],
                        "count": int(m.get("count") or 0),
                        "sum": _d64_bits(m.get("sum") or 0.0),
                    }
                else:
                    vm["value"] = float(m.get("value") or 0.0)
                if labels:
                    vm["labels"] = [None if v is None else str(v)
                                    for v in labels]
                vm["hash"] = metric_hash(fq, labels) if labels else 0
                values.append(vm)
            metrics.append({"meta": meta, "values": values})
    ctx = {
        "meta": {
            "cmetrics": {},
            "external": {},
            "processing": {
                "static_labels": [[k, v]
                                  for k, v in (static_labels or [])],
            },
        },
        "metrics": metrics,
    }
    return packb(ctx)


def decode_cmt_context(buf: bytes) -> list[dict]:
    """One context blob -> long sample dicts (one per value entry)."""
    ctx = unpackb(buf)
    if not isinstance(ctx, dict):
        raise ValueError("not a cmetrics context map")
    meta = ctx.get("meta") or {}
    static_labels = (meta.get("processing") or {}).get(
        "static_labels") or []
    sl_json = json.dumps({k: v for k, v in static_labels},
                         separators=(",", ":"), sort_keys=True)
    out = []
    for fam in ctx.get("metrics") or []:
        fmeta = fam.get("meta") or {}
        opts = fmeta.get("opts") or {}
        kind = _TYPE_NAME.get(fmeta.get("type"), "untyped")
        keys = fmeta.get("labels") or []
        bounds = fmeta.get("buckets")
        quantiles = fmeta.get("quantiles")
        for vm in fam.get("values") or []:
            vals = vm.get("labels") or []
            row = {
                "mtype": kind,
                "ns": opts.get("ns", ""),
                "ss": opts.get("ss", ""),
                "name": opts.get("name", ""),
                "desc": opts.get("desc", ""),
                "aggregation_type": fmeta.get("aggregation_type"),
                "labels": json.dumps(
                    dict(zip(keys, vals)), separators=(",", ":"),
                    sort_keys=True),
                "static": not vals,
                "ts": vm.get("ts", 0),
                # uint64 — stringified so it survives int64 columns
                "hash": str(vm.get("hash", 0)),
                "value": None, "bucket_bounds": bounds,
                "bucket_counts": None, "hist_sum": None,
                "hist_count": None, "quantiles": quantiles,
                "quantile_values": None, "quantiles_set": None,
                "sum_sum": None, "sum_count": None,
                "static_labels": sl_json,
            }
            if kind == "histogram":
                h = vm.get("histogram") or {}
                row["bucket_counts"] = h.get("buckets")
                row["hist_sum"] = h.get("sum")
                row["hist_count"] = h.get("count")
            elif kind == "summary":
                s = vm.get("summary") or {}
                row["quantile_values"] = [
                    _bits_d64(u) for u in s.get("quantiles") or []]
                row["quantiles_set"] = s.get("quantiles_set")
                row["sum_sum"] = _bits_d64(s.get("sum") or 0)
                row["sum_count"] = s.get("count")
            else:
                row["value"] = vm.get("value")
            out.append(row)
    return out


CMT_ROW_SCHEMA = (
    "mtype string, ns string, ss string, name string, desc string, "
    "aggregation_type long, labels string, static boolean, ts long, "
    "hash string, value double, bucket_bounds array<double>, "
    "bucket_counts array<long>, hist_sum double, hist_count long, "
    "quantiles array<double>, quantile_values array<double>, "
    "quantiles_set long, sum_sum double, sum_count long, "
    "static_labels string"
)


def parse_cmt_msgpack_df(df: DataFrame, data_col: str = "data"
                         ) -> DataFrame:
    """Binary cmetrics-msgpack blobs -> long sample rows."""
    import pandas as pd
    from pyspark.sql.types import StructType

    cols = [f.name for f in
            StructType.fromDDL(CMT_ROW_SCHEMA).fields]

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for buf in pdf[data_col]:
                if buf is None:
                    continue
                try:
                    rows.extend(decode_cmt_context(bytes(buf)))
                except (ValueError, KeyError, TypeError,
                        AttributeError, struct.error, IndexError):
                    continue  # undecodable chunk dropped
            yield pd.DataFrame(rows, columns=cols)

    return df.select(data_col).mapInPandas(walk, CMT_ROW_SCHEMA)


def cmt_msgpack_export(
    df: DataFrame,
    group_col: str = "chunk",
    static_labels: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Long metric rows (otlp_metrics_export shape + ns/ss/desc and
    summary quantiles_set) -> one cmetrics msgpack context per
    group. Rows are pinned to (mtype, name, labels, ts) walk order
    so the blob bytes are shuffle-stable."""
    import pandas as pd

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["mtype", "name", "labels", "ts"],
                              kind="mergesort")
        fams: dict[tuple, dict] = {}
        for r in pdf.itertuples(index=False):
            fkey = (r.mtype, r.ns, r.ss, r.name)
            fam = fams.get(fkey)
            if fam is None:
                fam = fams[fkey] = {
                    "type": r.mtype, "ns": r.ns, "ss": r.ss,
                    "name": r.name, "desc": r.desc,
                    "label_keys": [], "values": [],
                }
                if r.mtype == "histogram":
                    fam["buckets"] = (
                        list(r.explicit_bounds)
                        if r.explicit_bounds is not None else [])
                elif r.mtype == "summary":
                    fam["quantiles"] = (
                        list(r.quantiles)
                        if r.quantiles is not None else [])
                elif r.mtype == "counter":
                    fam["aggregation_type"] = int(
                        r.aggregation_type or 0)
            labels = json.loads(r.labels) if r.labels else {}
            for k in labels:
                if k not in fam["label_keys"]:
                    fam["label_keys"].append(k)
            m: dict = {
                "ts": int(r.ts),
                "labels": [labels[k] for k in fam["label_keys"]
                           if k in labels],
            }
            if r.mtype == "histogram":
                m["buckets"] = (list(r.bucket_counts)
                                if r.bucket_counts is not None else [])
                m["sum"] = r.hist_sum
                m["count"] = r.hist_count
            elif r.mtype == "summary":
                m["quantile_values"] = (
                    list(r.quantile_values)
                    if r.quantile_values is not None else [])
                m["sum"] = r.sum_sum
                m["count"] = r.sum_count
                m["quantiles_set"] = 1
            else:
                m["value"] = r.value
            fam["values"].append(m)
        blob = encode_cmt_context(list(fams.values()), static_labels)
        return pd.DataFrame({group_col: [key[0]], "data": [blob]})

    return (
        df.groupBy(group_col)
        .applyInPandas(build, f"{group_col} string, data binary")
    )
