"""Generic processor conditions engine.

Reference: /root/reference/include/fluent-bit/flb_conditionals.h:39-56
(ops EQ NEQ GT LT GTE LTE REGEX NOT_REGEX IN NOT_IN) evaluated over
record-accessor paths with AND/OR combination (src/flb_conditionals.c).
Comparisons between mismatched types are false, never an error —
replicated with try-cast + coalesce(False).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.functions.accessor import ra_col, ra_col_safe


@dataclass
class ConditionRule:
    field: str  # record-accessor path
    op: str  # eq|neq|gt|lt|gte|lte|regex|not_regex|in|not_in
    value: Any


def _num(col: Column) -> Column:
    # mismatched types compare false, never error (flb_sp.c:885-887)
    return col.try_cast("double")


def compile_rule(r: ConditionRule, df: DataFrame | None = None) -> Column:
    col = ra_col_safe(df, r.field) if df is not None else ra_col(r.field)
    op = r.op.lower()
    if op == "eq":
        return F.coalesce(col.cast("string") == F.lit(str(r.value)), F.lit(False))
    if op == "neq":
        return F.coalesce(col.cast("string") != F.lit(str(r.value)), F.lit(False))
    if op in ("gt", "lt", "gte", "lte"):
        a, b = _num(col), F.lit(float(r.value))
        cmp = {"gt": a > b, "lt": a < b, "gte": a >= b, "lte": a <= b}[op]
        return F.coalesce(cmp, F.lit(False))
    if op == "regex":
        return F.coalesce(col.cast("string").rlike(str(r.value)), F.lit(False))
    if op == "not_regex":
        return ~F.coalesce(col.cast("string").rlike(str(r.value)), F.lit(True))
    if op == "in":
        return F.coalesce(col.cast("string").isin([str(v) for v in r.value]), F.lit(False))
    if op == "not_in":
        return F.coalesce(
            ~col.cast("string").isin([str(v) for v in r.value]), F.lit(False)
        )
    raise ValueError(f"unknown condition op {r.op!r}")


def compile_condition(rules: list[ConditionRule], combine: str = "and", df: DataFrame | None = None) -> Column:
    if not rules:
        return F.lit(True)
    preds = [compile_rule(r, df) for r in rules]
    out = preds[0]
    for p in preds[1:]:
        out = (out & p) if combine == "and" else (out | p)
    return out


def where(df: DataFrame, rules: list[ConditionRule], combine: str = "and") -> DataFrame:
    return df.filter(compile_condition(rules, combine, df))
