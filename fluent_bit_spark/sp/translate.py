"""SP command -> DataFrame translation.

Replicates the execution semantics of flb_sp.c:

- Type lattice for comparisons (reduce_expression flb_sp.c:828-1046):
  numeric comparisons promote int->float and convert numeric strings
  (object_to_number, flb_sp.c:298-400); comparisons between
  unconvertible/mismatched types are FALSE, never an error; NULL in
  logical ops is false.
- IS NULL means "key exists with nil value"; IS NOT NULL is its exact
  negation, so a MISSING key satisfies IS NOT NULL (verified against
  cb_window_5_second: SUM over word3 IS NOT NULL = ids 0..9).
  Presence is tracked via an optional array column of present keys
  (fixture loader provides it); without one, presence degrades to
  non-null.
- COUNT(key) counts records, identical to COUNT(*)
  (flb_sp_aggregate_func.c:70-75,199-205).
- SUM is type-sticky: integral column -> long sum; anything else
  (double / numeric strings) -> double (itof promotion,
  flb_sp.c:788-798,1562-1565).
- TIMESERIES_FORECAST(x, t): least-squares fit of x over event-time
  seconds; prediction at latest_time + t
  (flb_sp_aggregate_func.c:223-308). Expressed with
  covar_pop/var_pop/avg/max — pure built-in aggregates.
- Windows: TUMBLING/HOPPING -> Spark event-time window() (the
  reference uses processing time; fixtures pin timestamps so results
  align — SURVEY.md §2.6).
- Aggregate queries emit one row per (window, group); non-aggregate
  queries are select+filter (+limit only honored for snapshots in the
  reference, flb_sp.c:417 — we honor explicit LIMIT on SELECT too).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluent_bit_spark.functions.globmatch import tag_match_col
from fluent_bit_spark.sp.parser import (
    Comparison,
    Contains,
    IsNull,
    Key,
    Logical,
    Operand,
    SpCommand,
    parse_sql,
)

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


class Translator:
    def __init__(
        self,
        df: DataFrame,
        ts_col: str = "event_time",
        tag_col: str = "tag",
        presence_col: str | None = None,
        keep_cols: list[str] | None = None,
    ):
        self.df = df
        self.ts_col = ts_col
        self.tag_col = tag_col
        self.presence_col = presence_col
        # pass-through columns appended to row-wise selections (used by
        # the engine to carry tag/event_time through CREATE STREAM
        # re-ingest, mirroring how msgpack records keep (ts, tag))
        self.keep_cols = keep_cols or []

    # ------------------------------------------------------------ helpers
    def _dtype(self, key: str, subkeys: list[str]) -> T.DataType | None:
        try:
            dt: T.DataType = self.df.schema[key].dataType
        except KeyError:
            return None
        for s in subkeys:
            if isinstance(dt, T.StructType):
                try:
                    dt = dt[str(s)].dataType
                except KeyError:
                    return None
            elif isinstance(dt, T.MapType):
                dt = dt.valueType
            elif isinstance(dt, T.ArrayType):
                dt = dt.elementType
            else:
                return None
        return dt

    def _key_col(self, name: str, subkeys: list[str]) -> Column:
        if name not in self.df.columns:
            return F.lit(None).cast("string")
        c = F.col(name)
        for s in subkeys:
            c = c.getItem(s)
        return c

    def _exists(self, name: str, subkeys: list[str]) -> Column:
        """@record.contains / key-presence semantics."""
        if name not in self.df.columns:
            return F.lit(False)
        if not subkeys and self.presence_col:
            return F.array_contains(F.col(self.presence_col), name)
        # nested or no presence info: presence == non-null
        if subkeys:
            return self._key_col(name, subkeys).isNotNull()
        return F.col(name).isNotNull()

    # --------------------------------------------------------- conditions
    def condition(self, node: Any) -> Column:
        if node is None:
            return F.lit(True)
        if isinstance(node, Logical):
            if node.op == "NOT":
                # the one spot where SQL three-valued logic diverges
                # from the reference in a filter: NOT(null-cmp) must
                # KEEP the row (NOT false = true, flb_sp.c:1031-1033)
                return ~F.coalesce(self.condition(node.left), F.lit(False))
            # AND/OR need no coalesce in filter context: null operands
            # drop the row either way, and bare operands keep parquet
            # predicate pushdown alive through the conjunction
            l = self.condition(node.left)
            r = self.condition(node.right)
            return (l & r) if node.op == "AND" else (l | r)
        if isinstance(node, IsNull):
            op = node.operand
            exists_and_nil = self._exists(op.value, op.subkeys) & self._key_col(
                op.value, op.subkeys
            ).isNull()
            return ~exists_and_nil if node.negated else exists_and_nil
        if isinstance(node, Contains):
            return self._exists(node.key.value, node.key.subkeys)
        if isinstance(node, Comparison):
            return self._compare(node)
        raise ValueError(f"unknown condition node {node!r}")

    def _operand_col(self, op: Operand) -> tuple[Column, str]:
        """-> (column, kind) where kind in key|int|float|str|bool|record_time."""
        if op.kind == "key":
            return self._key_col(op.value, op.subkeys), "key"
        if op.kind == "record_time":
            return F.col(self.ts_col).cast("double"), "record_time"
        return F.lit(op.value), op.kind

    def _compare(self, node: Comparison) -> Column:
        lc, lk = self._operand_col(node.left)
        rc, rk = self._operand_col(node.right)
        op = node.op

        def apply(a: Column, b: Column) -> Column:
            if op == "=":
                return a == b
            if op == "!=":
                return a != b
            if op == "<":
                return a < b
            if op == "<=":
                return a <= b
            if op == ">":
                return a > b
            return a >= b

        # type-aware comparison per the reference lattice
        lit_kind = rk if lk in ("key", "record_time") else lk
        key_op, lit_op = (node.left, node.right) if lk == "key" else (node.right, node.left)

        if lk == "key" and rk == "key":
            # key-vs-key goes through the same dtype lattice as
            # key-vs-literal (flb_sp.c:868-998): strings compare with
            # strcmp for EVERY operator, bools compare natively only
            # against bools, numerics compare numerically with int->float
            # promotion, and a numeric-vs-string pair converts the string
            # side (object_to_number; unconvertible -> null -> false).
            ldt = self._dtype(node.left.value, node.left.subkeys)
            rdt = self._dtype(node.right.value, node.right.subkeys)

            def is_num(dt: T.DataType | None) -> bool:
                return isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType, *_INTEGRAL))

            if isinstance(ldt, T.BooleanType) or isinstance(rdt, T.BooleanType):
                if isinstance(ldt, T.BooleanType) and isinstance(rdt, T.BooleanType):
                    return apply(lc, rc)
                return F.lit(False)  # bool vs anything else: mismatched -> false
            if isinstance(ldt, T.StringType) and isinstance(rdt, T.StringType):
                return apply(lc, rc)  # native string compare == strcmp ordering
            if is_num(ldt) and is_num(rdt):
                return apply(lc, rc)  # Spark promotes int->float natively
            # mixed numeric/string (or unknown dtype): numeric-coerce the
            # non-numeric side; non-numeric strings become null -> false
            lcn = lc if is_num(ldt) else lc.try_cast("double")
            rcn = rc if is_num(rdt) else rc.try_cast("double")
            return apply(lcn, rcn)
        if lk != "key" and rk != "key":
            return apply(lc, rc)

        key_col = lc if lk == "key" else rc
        lit_col = rc if lk == "key" else lc
        dtype = self._dtype(key_op.value, key_op.subkeys)
        if lit_kind == "bool":
            if dtype is not None and not isinstance(dtype, T.BooleanType):
                return F.lit(False)
            return apply(key_col, lit_col) if lk == "key" else apply(lit_col, key_col)
        if lit_kind == "str":
            if dtype is not None and not isinstance(dtype, (T.StringType,)):
                return F.lit(False)  # number vs string: mismatched -> false
            return apply(key_col, lit_col) if lk == "key" else apply(lit_col, key_col)
        # numeric literal (int/float/record_time): numeric strings convert
        if dtype is not None and isinstance(dtype, T.BooleanType):
            return F.lit(False)
        # already-numeric columns compare directly: a redundant
        # try_cast(double) would block parquet predicate pushdown at
        # the scan (the single biggest lever at 100 TB)
        if isinstance(dtype, (T.DoubleType, T.FloatType, *_INTEGRAL)):
            kc = key_col
        else:
            kc = key_col.try_cast("double")
        # bare null comparison == false in a filter; Logical() wraps
        # operands in coalesce where three-valued logic would differ
        return apply(kc, lit_col.cast("double")) if lk == "key" else apply(
            lit_col.cast("double"), kc
        )

    # --------------------------------------------------------------- keys
    def _agg_expr(self, key: Key) -> Column:
        name = key.out_name
        if key.aggr == "COUNT":
            # COUNT(key) counts records, like COUNT(*) — replicated delta
            return F.count(F.lit(1)).alias(name)
        src = self._key_col(key.name, key.subkeys)
        dtype = self._dtype(key.name, key.subkeys) if key.name else None
        numeric_src = src if isinstance(dtype, (T.DoubleType, T.FloatType, *_INTEGRAL)) else src.try_cast("double")
        if key.aggr == "SUM":
            if isinstance(dtype, _INTEGRAL):
                return F.sum(src).alias(name)
            return F.sum(numeric_src).alias(name)
        if key.aggr == "MIN":
            return F.min(src if dtype is not None else numeric_src).alias(name)
        if key.aggr == "MAX":
            return F.max(src if dtype is not None else numeric_src).alias(name)
        if key.aggr == "AVG":
            return (
                F.sum(numeric_src) / F.count(F.lit(1))
            ).alias(name)
        if key.aggr == "TIMESERIES_FORECAST":
            x = F.col(self.ts_col).cast("double")
            y = numeric_src
            b1 = F.covar_pop(x, y) / F.var_pop(x)
            b0 = F.avg(y) - b1 * F.avg(x)
            pred = b0 + b1 * (F.max(x) + F.lit(float(key.forecast_seconds or 0)))
            return pred.alias(name)
        raise ValueError(f"unknown aggregate {key.aggr!r}")

    def _scalar_expr(self, key: Key) -> Column:
        if key.time_func == "NOW":
            # "%Y-%m-%d %H:%M:%S" string (flb_sp_func_time.c)
            return F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss").alias(
                key.out_name
            )
        if key.time_func == "UNIX_TIMESTAMP":
            return F.unix_timestamp().alias(key.out_name)
        if key.record_func == "RECORD_TAG":
            return F.col(self.tag_col).alias(key.out_name)
        if key.record_func == "RECORD_TIME":
            return F.col(self.ts_col).cast("double").alias(key.out_name)
        return self._key_col(key.name, key.subkeys).alias(key.out_name)

    # ------------------------------------------------------------- driver
    def translate(self, cmd: SpCommand) -> DataFrame:
        df = self.df
        if cmd.source_type == "tag" and self.tag_col in df.columns:
            df = df.filter(tag_match_col(self.tag_col, cmd.source))
            self.df = df

        cond = self.condition(cmd.where)
        df = df.filter(cond)
        self.df = df

        has_agg = any(k.aggr for k in cmd.keys)
        if has_agg:
            # sp_cmd_aggregated_keys validation (flb_sp.c:232-289): an
            # aggregate query may only select aggregates, scalar
            # functions and group-by keys; '*' is never allowed
            gb_names = {g.name for g in cmd.group_by}
            for k in cmd.keys:
                if k.aggr or k.time_func or k.record_func:
                    continue
                if k.name is None:
                    raise ValueError(
                        "aggregate query cannot select '*' (flb_sp.c:232-289)"
                    )
                if k.name not in gb_names:
                    raise ValueError(
                        f"non-aggregate key {k.name!r} must appear in GROUP BY "
                        "(flb_sp.c:232-289)"
                    )
        if has_agg:
            group_cols: list[Column] = []
            if cmd.window:
                dur = f"{cmd.window.size_sec} seconds"
                if cmd.window.kind == "hopping":
                    w = F.window(F.col(self.ts_col), dur, f"{cmd.window.advance_sec} seconds")
                else:
                    w = F.window(F.col(self.ts_col), dur)
                group_cols.append(w.alias("window"))
            for g in cmd.group_by:
                group_cols.append(self._key_col(g.name, g.subkeys).alias(g.out_name))

            aggs: list[Column] = []
            for k in cmd.keys:
                if k.aggr:
                    aggs.append(self._agg_expr(k))
                elif k.time_func or k.record_func:
                    aggs.append(F.first(self._scalar_expr(k)).alias(k.out_name))
                # non-agg plain keys must be group-by keys
                # (sp_cmd_aggregated_keys validation, flb_sp.c:232-289)
            out = df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)
            # project group-by keys selected by name, drop window struct
            select_cols = []
            if cmd.window:
                select_cols.append(F.col("window.start").alias("window_start"))
            for k in cmd.keys:
                if k.aggr or k.time_func or k.record_func:
                    select_cols.append(F.col(f"`{k.out_name}`"))
                else:
                    select_cols.append(F.col(f"`{k.out_name}`"))
            # include group keys not in select? reference only emits
            # selected keys; group keys appear when selected.
            out = out.select(*select_cols)
        else:
            cols: list[Column] = []
            star = any(k.name is None and not k.aggr and not k.time_func and not k.record_func for k in cmd.keys)
            if star:
                cols = [F.col(c) for c in df.columns if c != self.presence_col]
                extra = [
                    self._scalar_expr(k)
                    for k in cmd.keys
                    if k.time_func or k.record_func
                ]
                cols.extend(extra)
            else:
                cols = [self._scalar_expr(k) for k in cmd.keys]
            if self.keep_cols:
                named = {k.out_name for k in cmd.keys if k.name is not None}
                if star:
                    named.update(c for c in df.columns if c != self.presence_col)
                cols.extend(
                    F.col(c) for c in self.keep_cols
                    if c in df.columns and c not in named
                )
            out = df.select(*cols)
            if cmd.limit is not None:
                out = out.limit(cmd.limit)
        return out


def translate(
    cmd: SpCommand,
    df: DataFrame,
    ts_col: str = "event_time",
    tag_col: str = "tag",
    presence_col: str | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    return Translator(df, ts_col, tag_col, presence_col, keep_cols).translate(cmd)


def run_query(
    sql: str,
    df: DataFrame,
    ts_col: str = "event_time",
    tag_col: str = "tag",
    presence_col: str | None = None,
) -> DataFrame:
    return translate(parse_sql(sql), df, ts_col, tag_col, presence_col)
