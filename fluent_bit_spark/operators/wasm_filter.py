"""filter_wasm: run a WebAssembly filter over every record.

Reference: plugins/filter_wasm/filter_wasm.c (cb_wasm_filter) and
src/wasm/flb_wasm.c:249 (flb_wasm_call_function_format_json). The
callback ABI in JSON mode:

    func(tag_ptr: i32, tag_len: i32, tv_sec: i32, tv_nsec: i32,
         record_ptr: i32, record_len: i32) -> i32

The i32 result is a pointer to a NUL-terminated string inside module
memory. The reference's disposition of that result, replicated here
exactly (filter_wasm.c:144-196):

    trap / NULL / bad pointer   -> record skipped (dropped)
    empty string                -> record skipped (dropped)
    valid JSON object           -> becomes the new record body,
                                   timestamp and metadata preserved
    non-object / invalid JSON   -> record dropped (encoder rollback)

Execution model: the module bytes ship in the task closure; each
partition decodes + instantiates ONE interpreter instance
(fluent_bit_spark.wasm.Instance) and streams its Arrow batches
through it — matching the reference, which instantiates per chunk and
runs every record of the chunk through the same instance (state in
module globals/memory persists within a partition, as it does within
a chunk). Host-side per-record allocations (tag/record dup_data) are
bump-rewound between records.

Like filter_lua, this is the designated slow path: a per-record
interpreter, useful for user-supplied logic Spark can't express. The
whole surrounding pipeline stays in Catalyst; only matched rows pay.
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..wasm.interp import Instance, WasmTrap, decode_module
from ..wasm.module import WasmDecodeError

OUT_SCHEMA = "tag string, ts double, record string"


def rebalance_for_interp(src: DataFrame) -> DataFrame:
    """Per-record interpreter stages are CPU-bound: spread them over
    every core even when the upstream scan is a single small file
    (one 2 MB parquet = one partition = one busy core while 31 idle).
    At real scale the scan already has more partitions than cores and
    this is a no-op; the round-robin exchange is deliberate and cheap
    relative to the interpreter work it parallelizes."""
    n = src.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < n:
        return src.repartition(n)
    return src


class WasmScript:
    """A loaded filter_wasm program: driver-side decode + validation,
    executor-side instantiation."""

    def __init__(
        self,
        wasm_bytes: bytes,
        function_name: str = "flb_filter",
        heap_max_pages: int = 1024,
        event_format: str = "json",
    ):
        self.wasm_bytes = bytes(wasm_bytes)
        self.function_name = function_name
        self.heap_max_pages = heap_max_pages
        if event_format not in ("json", "msgpack"):
            # filter_wasm.c config map: "event_format" json|msgpack
            raise ValueError(f"unknown wasm event_format {event_format!r}")
        self.event_format = event_format
        # driver-side validation, mirroring the reference's init-time
        # lookup failure (flb_wasm.c:266 "wasm function is not found")
        mod = decode_module(self.wasm_bytes)
        exp = mod.exports.get(function_name)
        if exp is None or exp[0] != 0:
            raise WasmDecodeError(
                f"the {function_name} wasm function is not found"
            )

    def make_runtime(self) -> "WasmRuntime":
        return WasmRuntime(self)


class WasmRuntime:
    def __init__(self, script: WasmScript):
        self.script = script
        self.instance = Instance(
            script.wasm_bytes, max_pages=script.heap_max_pages
        )
        self.errors = 0

    def invoke(self, tag: str, ts: float, record_json: str) -> str | None:
        """Returns the new record JSON, or None to skip the record.

        ``event_format msgpack``: the record crosses the boundary as raw
        msgpack both ways (filter_wasm.c:125-135 encode, :196-201
        re-ingest) — the result is still read as a C string, the same
        strlen() quirk the reference has."""
        inst = self.instance
        inst.reset_bump()
        mp = self.script.event_format == "msgpack"
        tag_b = tag.encode("utf-8")
        if mp:
            from ..wasm import mpack

            rec_b = mpack.packb(json.loads(record_json))
        else:
            rec_b = record_json.encode("utf-8")
        sec = math.floor(ts)
        nsec = int(round((ts - sec) * 1e9))
        try:
            tag_ptr = inst.dup_data(tag_b + b"\0")
            # msgpack mode dups the record without the +1 terminator
            # (flb_wasm.c:341-342 vs the JSON path)
            rec_ptr = inst.dup_data(rec_b if mp else rec_b + b"\0")
            res = inst.invoke(
                self.script.function_name,
                [tag_ptr, len(tag_b), sec & 0xFFFFFFFF, nsec,
                 rec_ptr, len(rec_b)],
            )
        except WasmTrap:
            self.errors += 1
            return None
        except RecursionError:
            self.errors += 1
            return None
        if not res:
            return None
        ptr = res[0]
        if not isinstance(ptr, int) or ptr <= 0 or ptr >= len(inst.memory):
            return None  # wasm_runtime_validate_app_str_addr failure
        try:
            raw = inst.read_cstr(ptr)
        except WasmTrap:
            return None
        if mp:
            from ..wasm import mpack

            try:
                out = json.dumps(mpack.unpackb(raw), sort_keys=True)
            except (ValueError, TypeError):
                return None
            return out
        try:
            out = raw.decode("utf-8")
        except UnicodeDecodeError:
            return None
        return out if out else None


def wasm_filter(
    df: DataFrame,
    wasm: bytes,
    function_name: str = "flb_filter",
    tag_col: str = "tag",
    ts_col: str = "event_time",
    record_cols: list[str] | None = None,
    heap_max_pages: int = 1024,
    event_format: str = "json",
) -> DataFrame:
    """Raw-shape wasm filter: returns (tag, ts double, record json)."""
    compiled = WasmScript(wasm, function_name, heap_max_pages, event_format)
    cols = record_cols or [c for c in df.columns if c not in (tag_col, ts_col)]
    src = df.select(
        F.col(tag_col).alias("tag"),
        F.col(ts_col).cast("double").alias("ts"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("record"),
    )

    src = rebalance_for_interp(src)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rt = compiled.make_runtime()  # one instance per partition
        for pdf in batches:
            out_tag, out_ts, out_rec = [], [], []
            for tag, ts, rec in zip(pdf["tag"], pdf["ts"], pdf["record"]):
                new_rec = rt.invoke(tag, float(ts), rec)
                if new_rec is None:
                    continue
                try:
                    parsed = json.loads(new_rec)
                except ValueError:
                    continue  # invalid JSON -> rollback (drop)
                if not isinstance(parsed, dict):
                    continue  # root_type != JSMN_OBJECT -> drop
                out_tag.append(tag)
                out_ts.append(float(ts))  # timestamp always preserved
                out_rec.append(json.dumps(parsed, sort_keys=True))
            yield pd.DataFrame({"tag": out_tag, "ts": out_ts, "record": out_rec})

    return src.mapInPandas(run, OUT_SCHEMA)


def wasm_filter_typed(
    df: DataFrame,
    wasm: bytes,
    function_name: str = "flb_filter",
    tag_col: str = "tag",
    ts_col: str = "event_time",
    extra_schema: str | None = None,
    gate=None,
    heap_max_pages: int = 1024,
    event_format: str = "json",
) -> DataFrame:
    """Schema-preserving :func:`wasm_filter` for the classic pipeline.

    Same Spark-first deviation as ``lua_filter_typed``: the reference's
    stream is schemaless msgpack, DataFrames are not, so keys the wasm
    program ADDS beyond the input columns must be declared via
    ``extra_schema`` (DDL string). ``gate`` (boolean Column, Match
    semantics) bypasses non-matching rows unchanged; bookkeeping
    columns (leading ``_``) are carried around the program invisibly.
    """
    from pyspark.sql import types as T

    if gate is not None:
        passthru = df.filter(~gate)
        df = df.filter(gate)
    else:
        passthru = None
    carry = [
        c for c in df.columns if c.startswith("_") and c not in (tag_col, ts_col)
    ]
    record_cols = [
        c for c in df.columns if c not in (tag_col, ts_col) and c not in carry
    ]
    has_ts = ts_col in df.columns
    ts_type = df.schema[ts_col].dataType if has_ts else T.DoubleType()
    compiled = WasmScript(wasm, function_name, heap_max_pages, event_format)
    carry_ddl = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in carry
    )
    src = df.select(
        F.col(tag_col).alias("tag"),
        (F.col(ts_col).cast("double") if has_ts else F.lit(0.0)).alias("ts"),
        F.to_json(F.struct(*[F.col(c) for c in record_cols])).alias("record"),
        *[F.col(c) for c in carry],
    )

    src = rebalance_for_interp(src)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rt = compiled.make_runtime()
        for pdf in batches:
            rows: list[dict] = []
            carry_vals = [pdf[c] for c in carry]
            for tag, ts, rec, *cv in zip(
                pdf["tag"], pdf["ts"], pdf["record"], *carry_vals
            ):
                new_rec = rt.invoke(tag, float(ts), rec)
                if new_rec is None:
                    continue
                try:
                    parsed = json.loads(new_rec)
                except ValueError:
                    continue
                if not isinstance(parsed, dict):
                    continue
                rows.append(
                    {
                        **dict(zip(carry, cv)),
                        "tag": tag,
                        "ts": float(ts),
                        "record": json.dumps(parsed, sort_keys=True),
                    }
                )
            yield pd.DataFrame(rows, columns=["tag", "ts", "record", *carry])

    raw = src.mapInPandas(run, OUT_SCHEMA + carry_ddl)
    out_schema = T.StructType([df.schema[c] for c in record_cols])
    if extra_schema:
        for fld in T.StructType.fromDDL(extra_schema).fields:
            if fld.name not in out_schema.fieldNames():
                out_schema.add(fld)
    parsed = raw.select(
        F.col("tag").alias(tag_col),
        *([F.col("ts").cast(ts_type).alias(ts_col)] if has_ts else []),
        *[F.col(c) for c in carry],
        F.from_json("record", out_schema).alias("_r"),
    ).select(tag_col, *([ts_col] if has_ts else []), *carry, "_r.*")
    if passthru is not None:
        parsed = passthru.unionByName(parsed, allowMissingColumns=True)
    return parsed
