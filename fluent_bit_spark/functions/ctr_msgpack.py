"""ctraces msgpack codec — the forward-protocol TRACES wire.

Reference: lib/ctraces/src/ctr_encode_msgpack.c and
ctr_decode_msgpack.c — the serialization fluent-bit uses for TRACES
events between instances and inside buffer chunks.

Wire shape (ctr_encode_msgpack_create :470): a 1-key root map
``{"resourceSpans": [...]}`` — camelCase, while every nested key is
snake_case including ``scope_spans`` (:433) — each resource-span a
3-key map:

- ``resource``: {attributes kvlist | nil, dropped_attributes_count}
- ``schema_url``: str | nil
- ``scope_spans``: [{scope {name|nil, version|nil, attributes|nil,
  dropped_attributes_count} | nil, spans [...], schema_url | nil}]

Each span is a 16-key map in fixed order (pack_span :309): trace_id
/ span_id / parent_span_id as LOWERCASE BASE16 STRINGS (pack_id
:183 via ctr_id_to_lower_base16, nil when unset — note the span
``flags`` field is NOT on the msgpack wire), trace_state, name,
kind u32 (defaults 1 = internal from ctr_span_create), start/end
_time_unix_nano u64, attributes kvlist ({} when created empty, nil
only when NULL), dropped_attributes/events/links counts, events
[{time_unix_nano, name, attributes, dropped_attributes_count}],
links [{trace_id, span_id, trace_state, attributes | nil,
dropped_attributes_count}], schema_url, and status {code i32,
message | nil}. Attribute values are cfl variants: str / bool /
int64 / double / array / kvlist / bytes (pack_variant :99).

The python encoder is byte-parity-pinned against a golden blob
produced by compiling the reference's own ctraces sources
(tests/test_ctr_msgpack.py, tests/data/ctr_msgpack_golden.bin);
the compiled reference decoder also accepts python-encoded blobs
and re-encodes them byte-identically.

Spark side mirrors the other wire codecs: flat span rows (the
parse_otlp_traces_df column shape) are grouped per flush chunk and
nested back into resource → scope → span order; one blob per chunk
via applyInPandas over an explicit hash repartition, and an Arrow
mapInPandas walk on the decode side.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame

from fluent_bit_spark.wasm.mpack import packb, unpackb


def _span_map(sp: dict) -> dict:
    ev = []
    for e in sp.get("events") or []:
        ev.append({
            "time_unix_nano": int(e.get("time_unix_nano") or 0),
            "name": e.get("name"),
            "attributes": e.get("attributes"),
            "dropped_attributes_count":
                int(e.get("dropped_attributes_count") or 0),
        })
    lk = []
    for l in sp.get("links") or []:
        lk.append({
            "trace_id": l.get("trace_id"),
            "span_id": l.get("span_id"),
            "trace_state": l.get("trace_state"),
            "attributes": l.get("attributes"),
            "dropped_attributes_count":
                int(l.get("dropped_attributes_count") or 0),
        })
    status = sp.get("status") or {}
    return {
        "trace_id": sp.get("trace_id"),
        "span_id": sp.get("span_id"),
        "parent_span_id": sp.get("parent_span_id"),
        "trace_state": sp.get("trace_state"),
        "name": sp.get("name"),
        "kind": int(sp.get("kind") if sp.get("kind") is not None
                    else 1),
        "start_time_unix_nano": int(
            sp.get("start_time_unix_nano") or 0),
        "end_time_unix_nano": int(sp.get("end_time_unix_nano") or 0),
        "attributes": sp.get("attributes"),
        "dropped_attributes_count":
            int(sp.get("dropped_attributes_count") or 0),
        "dropped_events_count":
            int(sp.get("dropped_events_count") or 0),
        "dropped_links_count":
            int(sp.get("dropped_links_count") or 0),
        "events": ev,
        "links": lk,
        "schema_url": sp.get("schema_url"),
        "status": {"code": int(status.get("code") or 0),
                   "message": status.get("message")},
    }


def encode_ctr_context(resource_spans: list[dict]) -> bytes:
    """[{resource: {attributes|None, dropped_attributes_count},
    schema_url, scope_spans: [{scope|None, spans, schema_url}]}]
    -> ctraces msgpack bytes."""
    out = []
    for rs in resource_spans:
        res = rs.get("resource") or {}
        sss = []
        for ss in rs.get("scope_spans") or []:
            scope = ss.get("scope")
            if scope is not None:
                scope = {
                    "name": scope.get("name"),
                    "version": scope.get("version"),
                    "attributes": scope.get("attributes"),
                    "dropped_attributes_count":
                        int(scope.get("dropped_attributes_count")
                            or 0),
                }
            sss.append({
                "scope": scope,
                "spans": [_span_map(sp)
                          for sp in ss.get("spans") or []],
                "schema_url": ss.get("schema_url"),
            })
        out.append({
            "resource": {
                "attributes": res.get("attributes"),
                "dropped_attributes_count":
                    int(res.get("dropped_attributes_count") or 0),
            },
            "schema_url": rs.get("schema_url"),
            "scope_spans": sss,
        })
    return packb({"resourceSpans": out})


def decode_ctr_context(buf: bytes) -> list[dict]:
    """ctraces msgpack bytes -> flat span rows keyed like
    parse_otlp_traces rows (resource_* / scope_* prefixes; the wire
    carries no span flags, left None)."""
    root = unpackb(buf)
    if not isinstance(root, dict):
        raise ValueError("not a ctraces map")
    rows: list[dict] = []
    for rs in root.get("resourceSpans") or []:
        res = rs.get("resource") or {}
        for ss in rs.get("scope_spans") or []:
            scope = ss.get("scope") or {}
            for sp in ss.get("spans") or []:
                status = sp.get("status") or {}
                rows.append({
                    "resource_attributes": res.get("attributes"),
                    "resource_schema_url": rs.get("schema_url"),
                    "resource_dropped_attributes_count":
                        res.get("dropped_attributes_count", 0),
                    "scope_name": scope.get("name"),
                    "scope_version": scope.get("version"),
                    "scope_attributes": scope.get("attributes"),
                    "scope_dropped_attributes_count":
                        scope.get("dropped_attributes_count", 0),
                    "scope_schema_url": ss.get("schema_url"),
                    "trace_id": sp.get("trace_id"),
                    "span_id": sp.get("span_id"),
                    "parent_span_id": sp.get("parent_span_id"),
                    "name": sp.get("name"),
                    "kind": sp.get("kind", 0),
                    "trace_state": sp.get("trace_state"),
                    "flags": None,  # not on the msgpack wire
                    "start_time_unix_nano":
                        sp.get("start_time_unix_nano", 0),
                    "end_time_unix_nano":
                        sp.get("end_time_unix_nano", 0),
                    "status_code": status.get("code", 0),
                    "status_message": status.get("message"),
                    "dropped_attributes_count":
                        sp.get("dropped_attributes_count", 0),
                    "dropped_events_count":
                        sp.get("dropped_events_count", 0),
                    "dropped_links_count":
                        sp.get("dropped_links_count", 0),
                    "attributes": sp.get("attributes"),
                    "events": sp.get("events") or [],
                    "links": sp.get("links") or [],
                })
    return rows


SPAN_ROW_SCHEMA = (
    "resource_attributes string, resource_schema_url string, "
    "resource_dropped_attributes_count long, "
    "scope_name string, scope_version string, "
    "scope_attributes string, scope_dropped_attributes_count long, "
    "scope_schema_url string, "
    "trace_id string, span_id string, parent_span_id string, "
    "name string, kind int, trace_state string, flags long, "
    "start_time_unix_nano long, end_time_unix_nano long, "
    "status_code int, status_message string, "
    "dropped_attributes_count long, dropped_events_count long, "
    "dropped_links_count long, "
    "attributes string, events string, links string"
)

_JSON_COLS = ("resource_attributes", "scope_attributes",
              "attributes", "events", "links")
_COLS = [c.split()[0] for c in SPAN_ROW_SCHEMA.split(", ")]


def parse_ctr_msgpack_df(df: DataFrame, data_col: str = "data"
                         ) -> DataFrame:
    """Binary ctraces-msgpack blobs -> flat span rows (JSON-string
    attribute/event/link columns, same shape as the OTLP/JSON traces
    parser so downstream selects are interchangeable)."""
    import pandas as pd

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for buf in pdf[data_col]:
                if buf is None:
                    continue
                try:
                    rows.extend(decode_ctr_context(bytes(buf)))
                except (ValueError, KeyError, TypeError,
                        AttributeError, IndexError):
                    continue  # undecodable chunk dropped
            cols: dict = {c: [] for c in _COLS}
            for r in rows:
                for c in _COLS:
                    v = r.get(c)
                    if c in _JSON_COLS:
                        v = json.dumps(v, separators=(",", ":"))
                    cols[c].append(v)
            yield pd.DataFrame({c: pd.Series(v, dtype="object")
                                for c, v in cols.items()})

    return df.select(data_col).mapInPandas(walk, SPAN_ROW_SCHEMA)


def ctr_msgpack_export(df: DataFrame, group_col: str = "chunk"
                       ) -> DataFrame:
    """Flat span rows -> one ctraces msgpack blob per group. Rows
    regroup into resource → scope → span nesting on the
    (resource_*, scope_*) JSON identities, in deterministic
    (resource, scope, start_ts, span_id) walk order."""
    import pandas as pd

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["resource_attributes", "resource_schema_url",
             "scope_name", "scope_attributes",
             "start_time_unix_nano", "span_id"],
            kind="mergesort", na_position="first")
        res_groups: dict[tuple, dict] = {}
        for r in pdf.itertuples(index=False):
            rkey = (r.resource_attributes, r.resource_schema_url,
                    r.resource_dropped_attributes_count)
            rg = res_groups.get(rkey)
            if rg is None:
                rg = res_groups[rkey] = {
                    # API-created resources/spans always own an attr
                    # kvlist (ctr_resource/ctr_span_create), so the
                    # canonical wire form is {} — nil only appears
                    # for genuinely NULL attr (links, scope)
                    "resource": {
                        "attributes":
                            (json.loads(r.resource_attributes)
                             if r.resource_attributes else None)
                            or {},
                        "dropped_attributes_count":
                            r.resource_dropped_attributes_count or 0,
                    },
                    "schema_url": r.resource_schema_url,
                    "scope_spans": [],
                    "_scopes": {},
                }
            skey = (r.scope_name, r.scope_version,
                    r.scope_attributes,
                    r.scope_dropped_attributes_count,
                    r.scope_schema_url)
            sg = rg["_scopes"].get(skey)
            if sg is None:
                scope = None
                if (r.scope_name is not None
                        or r.scope_version is not None
                        or r.scope_attributes not in (None, "null")
                        or r.scope_dropped_attributes_count):
                    scope = {
                        "name": r.scope_name,
                        "version": r.scope_version,
                        "attributes":
                            json.loads(r.scope_attributes)
                            if r.scope_attributes else None,
                        "dropped_attributes_count":
                            r.scope_dropped_attributes_count or 0,
                    }
                sg = {"scope": scope, "spans": [],
                      "schema_url": r.scope_schema_url}
                rg["_scopes"][skey] = sg
                rg["scope_spans"].append(sg)
            sg["spans"].append({
                "trace_id": r.trace_id, "span_id": r.span_id,
                "parent_span_id": r.parent_span_id,
                "trace_state": r.trace_state, "name": r.name,
                "kind": r.kind,
                "start_time_unix_nano": r.start_time_unix_nano,
                "end_time_unix_nano": r.end_time_unix_nano,
                "attributes": (json.loads(r.attributes)
                               if r.attributes else None) or {},
                "dropped_attributes_count":
                    r.dropped_attributes_count or 0,
                "dropped_events_count": r.dropped_events_count or 0,
                "dropped_links_count": r.dropped_links_count or 0,
                "events": json.loads(r.events) if r.events else [],
                "links": json.loads(r.links) if r.links else [],
                "schema_url": None,
                "status": {"code": r.status_code or 0,
                           "message": r.status_message},
            })
        rspans = []
        for rg in res_groups.values():
            rg.pop("_scopes")
            rspans.append(rg)
        blob = encode_ctr_context(rspans)
        return pd.DataFrame({group_col: [key[0]], "data": [blob]})

    return (
        df.groupBy(group_col)
        .applyInPandas(build, f"{group_col} string, data binary")
    )
