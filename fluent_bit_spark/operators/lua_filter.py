"""filter_lua: run REAL Lua scripts over records, Spark-first.

The reference embeds Lua 5.1 (plugins/filter_lua/lua.c:250-400,
lua_config.c:71-160): the user callback receives
``(tag, timestamp, record)`` and returns ``(code, timestamp, record)``
with the contract

    code -1 -> drop the record
    code  0 -> keep unchanged
    code  1 -> replaced (new timestamp + record); the record may be an
               ARRAY of maps => 1->N emission (lua.c split path)
    code  2 -> replaced record, keep original timestamp

Here the script runs on our pure-Python Lua 5.1 interpreter
(:mod:`fluent_bit_spark.lua.interp`) inside an Arrow-batched
``mapInPandas`` — the script is parsed ONCE on the driver (syntax
errors surface before any job runs) and the picklable AST ships in the
closure; each executor builds one interpreter per partition and reuses
it across the batch, mirroring the reference's one-lua_State-per-filter
model.

Value mapping mirrors src/flb_lua.c:
- Lua numbers that are integral emit as ints, fractional as doubles
  (flb_lua.c:248-262 lua_isinteger pack path).
- decoded containers carry a metatable type marker
  (flb_lua_setmetatable, flb_lua.c:67-86), so arrays stay arrays on the
  round-trip even when empty or holding nil holes ([1,null,"world"],
  []); a SCRIPT-built table packs as an array only when its integer
  keys are exactly 1..n (flb_lua_arraylength, flb_lua.c:304-336), else
  as a map — so a script's ``{}`` emits ``{}``.
- ``type_int_key`` (lua_config.c:130) forces listed keys to int;
  ``type_array_key`` (lua_config.c:149) forces listed keys to arrays.
- ``enable_flb_null`` (lua.c:143-144): record nulls decode to the
  ``flb_null`` global and pack back to null; when off they decode to
  nil and map keys vanish, exactly like the reference.
- ``protected_mode``: a Lua runtime error keeps the record unchanged
  (reference logs the error and drops the whole batch result on the
  failing record; we keep-and-count, surfacing a `_lua_error` counter
  via the returned metrics hook).
- ``time_as_table``: the callback receives ``{sec=, nsec=}`` instead of
  a double timestamp (flb_lua.c:44-51 pushtimetable).
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lua.interp import Interpreter, LuaError, LuaTable
from ..lua.lexer import LuaSyntaxError
from .wasm_filter import rebalance_for_interp
from ..lua.parser import parse

OUT_SCHEMA = "tag string, ts double, record string"


class _FlbNull:
    """The ``flb_null`` sentinel (flb_lua.c:28-37): a lightuserdata(NULL)
    global the reference sets when ``enable_flb_null`` is on. Record nulls
    decode to it (flb_lua.c:99 mpack_type_nil -> lua_getglobal) and it
    packs back to msgpack nil (flb_lua.c:625 LUA_TLIGHTUSERDATA==NULL)."""

    __slots__ = ()

    def __repr__(self) -> str:  # tostring() surface
        return "flb_null"


FLB_NULL = _FlbNull()

# flb_lua.h:38-40 enum: INT=0, ARRAY=1, MAP=2 — stored in the metatable
# "type" field by flb_lua_setmetatable (flb_lua.c:67-86) on every decoded
# container so round-trips keep array-ness (empty arrays, nil holes).
_TYPE_ARRAY = 1.0
_TYPE_MAP = 2.0


def _marked(t: LuaTable, dtype: float) -> LuaTable:
    mt = LuaTable()
    mt.raw_set("type", dtype)
    t.metatable = mt
    return t


def py_to_lua(v: Any, *, null: Any = None) -> Any:
    """Python record value -> Lua value (flb_lua_pushmpack path).

    ``null`` is what JSON null becomes: ``None`` (Lua nil — vanishes from
    maps exactly like the reference without enable_flb_null) or
    ``FLB_NULL`` when enable_flb_null is on."""
    if isinstance(v, dict):
        t = LuaTable()
        for k, val in v.items():
            t.raw_set(k, py_to_lua(val, null=null))
        return _marked(t, _TYPE_MAP)
    if isinstance(v, (list, tuple)):
        t = LuaTable()
        for i, val in enumerate(v, 1):
            t.raw_set(float(i), py_to_lua(val, null=null))
        return _marked(t, _TYPE_ARRAY)
    if v is None:
        return null
    if isinstance(v, bool) or isinstance(v, str):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return str(v)


def _maxn(t: LuaTable) -> int:
    """Largest positive integer key (table.maxn, flb_lua.c:270-302)."""
    mx = 0
    for k, _ in t.lua_pairs():
        if isinstance(k, float) and k.is_integer() and k >= 1:
            mx = max(mx, int(k))
    return mx


def _arraylength(t: LuaTable) -> int:
    """flb_lua_arraylength (flb_lua.c:304-336): the unmarked-table
    heuristic — maxn if the table holds EXACTLY maxn integer keys (no
    holes, no string keys), else -1 meaning pack as a map."""
    mx = 0
    count = 0
    for k, _ in t.lua_pairs():
        if not (isinstance(k, float) and k.is_integer() and k >= 1):
            return -1
        count += 1
        mx = max(mx, int(k))
    if mx != count:
        return -1
    return mx


def lua_to_py(v: Any, *, int_keys: frozenset = frozenset(),
              array_keys: frozenset = frozenset(), _key: str | None = None) -> Any:
    if v is FLB_NULL:
        return None
    if isinstance(v, LuaTable):
        dtype = (
            v.metatable.raw_get("type") if v.metatable is not None else None
        )
        if dtype == _TYPE_ARRAY:
            # lua_toarray path (flb_lua.c:358-377): walk 1..len; nil
            # holes pack as null — this is how [1,null,"world"] and []
            # survive the round-trip byte-identically.
            return [
                lua_to_py(v.raw_get(float(i)), int_keys=int_keys,
                          array_keys=array_keys)
                for i in range(1, _maxn(v) + 1)
            ]
        if dtype != _TYPE_MAP:
            n = _arraylength(v)
            if n > 0:
                return [
                    lua_to_py(v.raw_get(float(i)), int_keys=int_keys,
                              array_keys=array_keys)
                    for i in range(1, n + 1)
                ]
            if _key is not None and _key in array_keys and not v.data:
                return []
        out = {}
        for k, val in v.lua_pairs():
            ks = k if isinstance(k, str) else _num_key(k)
            out[ks] = lua_to_py(val, int_keys=int_keys,
                                array_keys=array_keys, _key=ks)
        return out
    if isinstance(v, float):
        if _key is not None and _key in int_keys:
            return int(v)
        if v.is_integer() and abs(v) < 2**63:
            return int(v)
        return v
    if isinstance(v, bool) or v is None or isinstance(v, (str, int)):
        return v
    return str(v)


def _num_key(k: Any) -> str:
    if isinstance(k, float) and k.is_integer():
        return str(int(k))
    return str(k)


class LuaScript:
    """A compiled filter_lua script: driver-side parse, executor-side run."""

    def __init__(
        self,
        source: str,
        call: str = "cb_filter",
        type_int_key: tuple[str, ...] = (),
        type_array_key: tuple[str, ...] = (),
        protected_mode: bool = True,
        time_as_table: bool = False,
        enable_flb_null: bool = False,
    ):
        self.ast = parse(source)  # raises LuaSyntaxError on the driver
        self.call = call
        self.int_keys = frozenset(type_int_key)
        self.array_keys = frozenset(type_array_key)
        self.protected_mode = protected_mode
        self.time_as_table = time_as_table
        self.enable_flb_null = enable_flb_null
        # driver-side validation that the callback exists (reference
        # lua_config.c flb_lua_is_valid_func check at init time)
        probe = Interpreter()
        probe.run_ast(self.ast)
        if probe.get_global(call) is None:
            raise LuaSyntaxError(f"function {call!r} is not found in the script")

    # executor-side: build one interpreter and bind the callback
    def make_runtime(self) -> "LuaRuntime":
        return LuaRuntime(self)


class LuaRuntime:
    def __init__(self, script: LuaScript):
        self.script = script
        self.interp = Interpreter()
        if script.enable_flb_null:
            # reference sets the global BEFORE loading the script
            # (plugins/filter_lua/lua.c:143-144) so top-level code sees it
            self.interp.globals.raw_set("flb_null", FLB_NULL)
        self.interp.run_ast(script.ast)
        self.fn = self.interp.get_global(script.call)
        self.errors = 0

    def invoke(self, tag: str, ts: float, record: dict) -> tuple[int, float, Any]:
        """Returns (code, out_ts, py_record_or_list)."""
        s = self.script
        if s.time_as_table:
            tt = LuaTable()
            sec = math.floor(ts)
            tt.raw_set("sec", float(sec))
            tt.raw_set("nsec", round((ts - sec) * 1e9))
            ts_arg: Any = tt
        else:
            ts_arg = float(ts)
        null = FLB_NULL if s.enable_flb_null else None
        try:
            rets = self.interp.call(
                self.fn, [tag, ts_arg, py_to_lua(record, null=null)]
            )
        except LuaError as exc:
            if s.protected_mode:
                self.errors += 1
                return 0, ts, record
            raise
        except RecursionError:
            if s.protected_mode:
                self.errors += 1
                return 0, ts, record
            raise
        code = int(rets[0]) if rets and rets[0] is not None else 0
        if code <= -1:
            return -1, ts, record
        if code == 0:
            return 0, ts, record
        out_ts = ts
        if code == 1:
            t_ret = rets[1] if len(rets) > 1 else None
            if isinstance(t_ret, LuaTable):  # time_as_table return
                sec = t_ret.raw_get("sec") or 0.0
                nsec = t_ret.raw_get("nsec") or 0.0
                out_ts = float(sec) + float(nsec) / 1e9
            elif t_ret is not None:
                out_ts = float(t_ret)
        rec_ret = rets[2] if len(rets) > 2 else None
        py = lua_to_py(rec_ret, int_keys=s.int_keys, array_keys=s.array_keys)
        return code, out_ts, py


def lua_filter_typed(
    df: DataFrame,
    script: str,
    call: str = "cb_filter",
    tag_col: str = "tag",
    ts_col: str = "event_time",
    extra_schema: str | None = None,
    gate=None,
    type_int_key: tuple[str, ...] = (),
    type_array_key: tuple[str, ...] = (),
    protected_mode: bool = True,
    time_as_table: bool = False,
    enable_flb_null: bool = False,
    record_cols: list[str] | None = None,
) -> DataFrame:
    """Schema-preserving :func:`lua_filter` for the classic pipeline.

    The reference's record stream is schemaless msgpack, so a Lua
    callback may emit any keys (plugins/filter_lua/lua.c pack path).
    Spark DataFrames are schema-ful, so this wrapper re-expands the
    filtered JSON back into the INPUT column schema; keys the script
    adds beyond the input set must be declared via ``extra_schema``
    (a DDL string, e.g. ``"flagged string, bucket bigint"``) — a
    documented Spark-first deviation. Undeclared new keys are dropped;
    declared-but-absent keys come back NULL.

    ``gate`` (a boolean Column, Match semantics) bypasses non-matching
    rows unchanged. Bookkeeping columns (leading ``_``, e.g. ``_seq``)
    are carried through outside the record and are invisible to the
    script; 1->N emissions duplicate them.
    """
    from pyspark.sql import types as T

    if gate is not None:
        passthru = df.filter(~gate)
        df = df.filter(gate)
    else:
        passthru = None
    if record_cols is not None:
        # processor-group mode: only these columns form the Lua record;
        # everything else (envelope metadata, attribute maps) is carried
        # through untouched — the reference's lua unit likewise sees only
        # the log body while group records bypass it (lua.c group path)
        carry = [
            c for c in df.columns
            if c not in (tag_col, ts_col) and c not in record_cols
        ]
    else:
        carry = [
            c for c in df.columns
            if c.startswith("_") and c not in (tag_col, ts_col)
        ]
        record_cols = [
            c for c in df.columns if c not in (tag_col, ts_col) and c not in carry
        ]
    has_ts = ts_col in df.columns
    ts_type = df.schema[ts_col].dataType if has_ts else T.DoubleType()
    compiled = LuaScript(
        script,
        call=call,
        type_int_key=tuple(type_int_key),
        type_array_key=tuple(type_array_key),
        protected_mode=protected_mode,
        time_as_table=time_as_table,
        enable_flb_null=enable_flb_null,
    )
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
        rt = compiled.make_runtime()  # one lua_State per partition
        for pdf in batches:
            rows: list[dict] = []
            carry_vals = [pdf[c] for c in carry]
            for tag, ts, rec, *cv in zip(
                pdf["tag"], pdf["ts"], pdf["record"], *carry_vals
            ):
                code, new_ts, new_rec = rt.invoke(
                    tag, float(ts), json.loads(rec)
                )
                if code == -1:
                    continue
                base = dict(zip(carry, cv))
                base["tag"] = tag
                if code == 0:
                    rows.append({**base, "ts": float(ts), "record": rec})
                    continue
                records = (
                    new_rec
                    if isinstance(new_rec, list)
                    and all(isinstance(r, dict) for r in new_rec)
                    and new_rec
                    else [new_rec]
                )
                for r in records:  # 1->N emission (lua.c split path)
                    rows.append(
                        {**base, "ts": new_ts,
                         "record": json.dumps(r, sort_keys=True)}
                    )
            yield pd.DataFrame(
                rows, columns=["tag", "ts", "record", *carry]
            )

    raw = src.mapInPandas(run, OUT_SCHEMA + carry_ddl)
    out_schema = T.StructType(
        [df.schema[c] for c in record_cols]
    )
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


def lua_filter(
    df: DataFrame,
    script: str,
    call: str = "cb_filter",
    tag_col: str = "tag",
    ts_col: str = "event_time",
    record_cols: list[str] | None = None,
    type_int_key: tuple[str, ...] = (),
    type_array_key: tuple[str, ...] = (),
    protected_mode: bool = True,
    time_as_table: bool = False,
    enable_flb_null: bool = False,
) -> DataFrame:
    """Run a Lua filter over every record.

    Returns ``(tag string, ts double, record string)`` rows — the same
    shape as :func:`fluent_bit_spark.operators.udf_hook.apply_hook` —
    with drop/keep/modify/1->N semantics per the reference codes.
    Records emitted by 1->N expansion keep the (possibly replaced)
    timestamp; JSON record keys are emitted sorted for determinism.
    """
    compiled = LuaScript(
        script,
        call=call,
        type_int_key=tuple(type_int_key),
        type_array_key=tuple(type_array_key),
        protected_mode=protected_mode,
        time_as_table=time_as_table,
        enable_flb_null=enable_flb_null,
    )
    cols = record_cols or [c for c in df.columns if c not in (tag_col, ts_col)]
    src = df.select(
        F.col(tag_col).alias("tag"),
        F.col(ts_col).cast("double").alias("ts"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("record"),
    )

    src = rebalance_for_interp(src)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rt = compiled.make_runtime()  # one lua_State per partition
        for pdf in batches:
            out_tag, out_ts, out_rec = [], [], []
            for tag, ts, rec in zip(pdf["tag"], pdf["ts"], pdf["record"]):
                code, new_ts, new_rec = rt.invoke(tag, float(ts), json.loads(rec))
                if code == -1:
                    continue
                if code == 0:
                    out_tag.append(tag)
                    out_ts.append(float(ts))
                    out_rec.append(rec)
                    continue
                records = (
                    new_rec
                    if isinstance(new_rec, list)
                    and all(isinstance(r, dict) for r in new_rec)
                    and new_rec
                    else [new_rec]
                )
                for r in records:  # 1->N emission (lua.c split path)
                    out_tag.append(tag)
                    out_ts.append(new_ts)
                    out_rec.append(json.dumps(r, sort_keys=True))
            yield pd.DataFrame({"tag": out_tag, "ts": out_ts, "record": out_rec})

    return src.mapInPandas(run, OUT_SCHEMA)
