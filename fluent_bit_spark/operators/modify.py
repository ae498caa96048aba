"""filter_modify: conditional record mutations.

Reference: /root/reference/plugins/filter_modify/modify.c — 11 rule
types (modify.h:28-40) gated by 10 condition types (modify.h:42-53).
The reference is schemaless (a key "exists" per record); here a
record is a row of nullable columns, so per-record key presence maps
to non-null and per-record rule applicability becomes a
when(...) expression. Everything stays in Catalyst.

Key per-record preconditions preserved from the appliers
(modify.c:955-1304):
- RENAME k->v:       applies iff k present AND v absent
- HARD_RENAME k->v:  applies iff k present (overwrites v)
- COPY k->v:         applies iff k present AND v absent
- HARD_COPY k->v:    applies iff k present
- ADD k val:         applies iff k absent
- SET k val:         always
- REMOVE/.._WILDCARD/.._REGEX: schema-level column drops
- MOVE_TO_START/END: schema-level column reorder

Conditions whose semantics need care (modify.c:746-891):
- KEY_VALUE_DOES_NOT_EQUAL / _DOES_NOT_MATCH are false when the key is
  absent (they require KEY_EXISTS first).
- MATCHING_KEYS_HAVE_MATCHING_VALUES: every present key whose NAME
  matches regex A has a string value matching regex B.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class ModifyRule:
    op: str  # rename|hard_rename|add|set|remove|remove_wildcard|remove_regex|copy|hard_copy|move_to_start|move_to_end
    key: str
    value: str | None = None  # target key (rename/copy) or literal value (add/set)


@dataclass
class ModifyCondition:
    op: str  # key_exists|key_does_not_exist|a_key_matches|no_key_matches|key_value_equals|key_value_does_not_equal|key_value_matches|key_value_does_not_match|matching_keys_have_matching_values|matching_keys_do_not_have_matching_values
    a: str
    b: str | None = None


def _exists(df: DataFrame, key: str) -> Column:
    return F.col(key).isNotNull() if key in df.columns else F.lit(False)


def compile_modify_condition(df: DataFrame, c: ModifyCondition) -> Column:
    op = c.op.lower()
    if op == "key_exists":
        return _exists(df, c.a)
    if op == "key_does_not_exist":
        return ~_exists(df, c.a)
    if op == "a_key_matches":
        cols = [k for k in df.columns if re.search(c.a, k)]
        pred = F.lit(False)
        for k in cols:
            pred = pred | F.col(k).isNotNull()
        return pred
    if op == "no_key_matches":
        return ~compile_modify_condition(df, ModifyCondition("a_key_matches", c.a))
    if op == "key_value_equals":
        return _exists(df, c.a) & (F.col(c.a).cast("string") == c.b) if c.a in df.columns else F.lit(False)
    if op == "key_value_does_not_equal":
        # requires key exists (modify.c:808-819)
        if c.a not in df.columns:
            return F.lit(False)
        return _exists(df, c.a) & ~(F.col(c.a).cast("string") == c.b)
    if op == "key_value_matches":
        if c.a not in df.columns:
            return F.lit(False)
        return F.coalesce(F.col(c.a).cast("string").rlike(c.b), F.lit(False))
    if op == "key_value_does_not_match":
        if c.a not in df.columns:
            return F.lit(False)
        return _exists(df, c.a) & ~F.coalesce(F.col(c.a).cast("string").rlike(c.b), F.lit(False))
    if op == "matching_keys_have_matching_values":
        cols = [k for k in df.columns if re.search(c.a, k)]
        pred = F.lit(True)
        for k in cols:
            v = F.col(k).cast("string")
            pred = pred & (v.isNull() | F.coalesce(v.rlike(c.b), F.lit(False)))
        return pred
    if op == "matching_keys_do_not_have_matching_values":
        return ~compile_modify_condition(
            df, ModifyCondition("matching_keys_have_matching_values", c.a, c.b)
        )
    raise ValueError(f"unknown modify condition {c.op!r}")


def modify(
    df: DataFrame,
    rules: list[ModifyRule],
    conditions: list[ModifyCondition] | None = None,
    gate: Column | None = None,
) -> DataFrame:
    """Apply the rule list under the AND of all conditions.

    ``gate``: extra row predicate ANDed with the conditions (used by
    classic-mode Match scoping — rules apply only to gated rows, in
    ONE scan, no plan branching). When any gating is present,
    key-removal rules null the value per-row instead of dropping the
    column (the columnar rendering of "this record lacks the key");
    column-order moves stay schema-wide (row order has no per-row
    meaning in a DataFrame).
    """
    has_gate = bool(conditions) or gate is not None
    gate = gate if gate is not None else F.lit(True)
    for c in conditions or []:
        gate = gate & compile_modify_condition(df, c)

    for r in rules:
        op = r.op.lower()
        if op in ("rename", "hard_rename", "copy", "hard_copy"):
            src, dst = r.key, r.value
            if src not in df.columns:
                continue  # no key matching -> NOTOUCH
            src_c = F.col(src)
            dst_c = F.col(dst) if dst in df.columns else F.lit(None).cast(
                df.schema[src].dataType
            )
            if op in ("rename", "copy"):
                applies = gate & src_c.isNotNull() & dst_c.isNull()
            else:
                applies = gate & src_c.isNotNull()
            df = df.withColumn(dst, F.when(applies, src_c).otherwise(dst_c))
            if op in ("rename", "hard_rename"):
                if src != dst:
                    df = df.withColumn(src, F.when(applies, F.lit(None)).otherwise(F.col(src)))
                    # schema-level: drop the source column entirely when
                    # unconditional (mirrors the reference's key removal)
                    if not has_gate:
                        df = df.drop(src)
        elif op == "add":
            if r.key in df.columns:
                df = df.withColumn(
                    r.key,
                    F.when(gate & F.col(r.key).isNull(), F.lit(r.value)).otherwise(
                        F.col(r.key).cast("string")
                    ),
                )
            else:
                df = df.withColumn(r.key, F.when(gate, F.lit(r.value)))
        elif op == "set":
            if r.key in df.columns:
                df = df.withColumn(
                    r.key,
                    F.when(gate, F.lit(r.value)).otherwise(F.col(r.key).cast("string")),
                )
            else:
                df = df.withColumn(r.key, F.when(gate, F.lit(r.value)))
        elif op in ("remove", "remove_wildcard", "remove_regex"):
            if op == "remove":
                targets = [k for k in df.columns if k == r.key]
            elif op == "remove_wildcard":
                targets = [k for k in df.columns if k.startswith(r.key)]
            else:
                targets = [k for k in df.columns if re.search(r.key, k)]
            if has_gate:
                for k in targets:
                    df = df.withColumn(
                        k, F.when(gate, F.lit(None)).otherwise(F.col(k))
                    )
            elif targets:
                df = df.drop(*targets)
        elif op == "move_to_start":
            moved = [k for k in df.columns if k == r.key]
            rest = [k for k in df.columns if k != r.key]
            df = df.select(*moved, *rest)
        elif op == "move_to_end":
            moved = [k for k in df.columns if k == r.key]
            rest = [k for k in df.columns if k != r.key]
            df = df.select(*rest, *moved)
        else:
            raise ValueError(f"unknown modify rule {r.op!r}")
    return df
