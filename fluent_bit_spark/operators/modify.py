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


def _resolve(df: DataFrame, key: str) -> Column | None:
    """Column for a condition key: a plain top-level name, or a record
    accessor path (``$nest['k1']`` — modify.c conditions take RA paths,
    flb_ra_get per record). Nested subscripts into a STRING column
    navigate it as JSON text (the columnar rendering of a nested
    msgpack submap the input left unexploded). None = key can never
    exist in this schema."""
    from pyspark.sql import types as T

    from fluent_bit_spark.functions import accessor as _ra

    key = key.strip()
    if not key.startswith("$"):
        return F.col(key) if key in df.columns else None
    m = _ra._ACCESSOR_RE.fullmatch(key)
    if not m or m.group(0).startswith("$TAG") or m.group(2) is None:
        return _ra.ra_col(key)
    root = m.group(2)
    if root not in df.columns:
        return None
    subs = _ra._subscripts(m.group(3) or "")
    col = F.col(root)
    if subs and isinstance(df.schema[root].dataType, T.StringType):
        path = "$" + "".join(
            f"[{s}]" if isinstance(s, int) else f".{s}" for s in subs
        )
        return F.get_json_object(col, path)
    # walk the schema alongside the column: getItem on a struct field
    # the schema lacks is an ANALYSIS error, but for a condition it
    # just means the key can never exist (flb_ra_get returns not-found)
    dt = df.schema[root].dataType
    for s in subs:
        if isinstance(dt, T.StructType):
            if not isinstance(s, str) or s not in dt.fieldNames():
                return None
            dt = dt[s].dataType
        elif isinstance(dt, T.MapType):
            dt = dt.valueType
        elif isinstance(dt, T.ArrayType):
            dt = dt.elementType
        else:
            return None
        col = col.getItem(s)
    return col


def _exists(df: DataFrame, key: str) -> Column:
    col = _resolve(df, key)
    return col.isNotNull() if col is not None else F.lit(False)


def compile_modify_condition(df: DataFrame, c: ModifyCondition) -> Column:
    op = c.op.lower()
    a_col = _resolve(df, c.a)
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
        if a_col is None:
            return F.lit(False)
        return F.coalesce(a_col.cast("string") == c.b, F.lit(False))
    if op == "key_value_does_not_equal":
        # requires key exists (modify.c:808-819)
        if a_col is None:
            return F.lit(False)
        return a_col.isNotNull() & ~(a_col.cast("string") == c.b)
    if op == "key_value_matches":
        if a_col is None:
            return F.lit(False)
        return F.coalesce(a_col.cast("string").rlike(c.b), F.lit(False))
    if op == "key_value_does_not_match":
        if a_col is None:
            return F.lit(False)
        return a_col.isNotNull() & ~F.coalesce(
            a_col.cast("string").rlike(c.b), F.lit(False)
        )
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
            # case-only rename (A3 -> a3): record keys are
            # case-sensitive in the reference but Spark resolves
            # column names case-insensitively, so withColumn would
            # clobber the source; express it as a schema rename.
            # (A gated case-only rename — two same-spelling keys
            # differing only in case within one column — is not
            # representable columnar-side and stays a documented
            # limitation.)
            if (
                op in ("rename", "hard_rename")
                and not has_gate
                and src != dst
                and src.lower() == dst.lower()
            ):
                df = df.withColumnRenamed(src, dst)
                continue
            src_c = F.col(src)
            dst_in_schema = dst in df.columns
            dst_c = F.col(dst) if dst_in_schema else F.lit(None).cast(
                df.schema[src].dataType
            )
            if op in ("rename", "copy"):
                applies = gate & src_c.isNotNull() & dst_c.isNull()
            else:
                applies = gate & src_c.isNotNull()
            df = df.withColumn(dst, F.when(applies, src_c).otherwise(dst_c))
            if op in ("rename", "hard_rename"):
                if src != dst:
                    # drop the source column outright only when the move
                    # provably applied to every row holding it: no gate,
                    # and either hard_rename or a dst that cannot block
                    # (absent from the schema). A plain rename onto an
                    # existing dst is a per-row no-op where dst is set —
                    # dropping src there would LOSE the source key
                    # (reference keeps it, modify.c RENAME precondition)
                    if not has_gate and (op == "hard_rename" or not dst_in_schema):
                        df = df.drop(src)
                    else:
                        df = df.withColumn(
                            src,
                            F.when(applies, F.lit(None)).otherwise(F.col(src)),
                        )
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
