"""processor_content_modifier: insert/upsert/delete/rename/hash/extract/convert.

Reference: /root/reference/plugins/processor_content_modifier/
cm_config.c:28-74 (actions), cm_logs.c:295 (log path). Actions operate
on the record body, optionally gated by a conditions tree
(operators/conditions.py).

- insert:  add key only if absent
- upsert:  add or overwrite
- delete:  remove key
- rename:  change key name
- hash:    value := sha256(value) hex  (cm_config.c:40-41)
- extract: named-group regex over the value -> new keys (cm_config.c:43-44)
- convert: cast value to int/double/boolean/string
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.operators.conditions import ConditionRule, compile_condition
from fluent_bit_spark.parsers.compile import capture_group_indexes, to_java_regex


_CONVERT = {"int": "long", "integer": "long", "double": "double", "float": "double",
            "boolean": "boolean", "bool": "boolean", "string": "string"}


# OTel envelope contexts -> (map column, fixed entry key or None).
# cm_config.c:119-199: resource/scope attribute contexts edit the
# attribute maps carried by the envelope (otel_envelope_cols columns);
# scope name/version edit fixed entries of the scope body.
_OTEL_CONTEXTS = {
    "otel_resource_attributes": ("resource", None),
    "otel_scope_attributes": ("scope", None),
    "otel_scope_name": ("scope", "name"),
    "otel_scope_version": ("scope", "version"),
}


def _map_entry_op(
    df: DataFrame,
    col: str,
    action: str,
    key: str,
    value: str | None,
    gate: Column,
) -> DataFrame:
    """Apply a content_modifier action to one entry of a map column
    (cm_logs.c attribute-context path). Catalyst map functions only —
    no shuffle, stays in codegen."""
    m = F.col(col)
    has = F.map_contains_key(m, key)
    without = F.map_filter(m, lambda k, _: k != F.lit(key))
    with_kv = F.map_concat(without, F.create_map(F.lit(key), F.lit(value)))
    if action == "insert":
        new = F.when(gate & ~has, with_kv).otherwise(m)
    elif action == "upsert":
        new = F.when(gate, with_kv).otherwise(m)
    elif action == "delete":
        new = F.when(gate, without).otherwise(m)
    elif action == "rename":
        renamed = F.transform_keys(
            m, lambda k, _: F.when(k == F.lit(key), F.lit(value)).otherwise(k)
        )
        new = F.when(gate, renamed).otherwise(m)
    elif action == "hash":
        hashed = F.transform_values(
            m,
            lambda k, v: F.when(k == F.lit(key), F.sha2(v, 256)).otherwise(v),
        )
        new = F.when(gate, hashed).otherwise(m)
    else:
        raise ValueError(
            f"content_modifier action {action!r} unsupported for map context"
        )
    return df.withColumn(col, new)


def content_modifier(
    df: DataFrame,
    action: str,
    key: str,
    value: str | None = None,
    converted_type: str | None = None,
    pattern: str | None = None,
    conditions: list[ConditionRule] | None = None,
    combine: str = "and",
    context: str | None = None,
) -> DataFrame:
    gate: Column = compile_condition(conditions or [], combine)
    action = action.lower()

    ctx = (context or "").lower()
    if ctx in _OTEL_CONTEXTS:
        col, fixed = _OTEL_CONTEXTS[ctx]
        if col not in df.columns:
            raise ValueError(
                f"context {context!r} needs the {col!r} envelope column "
                "(run processor_opentelemetry_envelope first, as the "
                "reference requires a group to exist — cm_logs.c otel path)"
            )
        if fixed is not None:
            # scope name/version: the property VALUE goes to a fixed key;
            # the reference reads it from the rule's value field
            return _map_entry_op(df, col, action, fixed, value or key, gate)
        return _map_entry_op(df, col, action, key, value, gate)
    if ctx in ("attributes", "metadata", "log_metadata") and "metadata" in df.columns:
        # logs "attributes" context = the record metadata map
        # (cm_config.c:104-110); only when the pipeline carries one
        return _map_entry_op(df, "metadata", action, key, value, gate)
    if ctx not in ("", "attributes", "body", "metadata", "log_metadata", "log_body"):
        raise ValueError(f"unknown content_modifier context {context!r}")

    if action == "insert":
        if key in df.columns:
            df = df.withColumn(
                key, F.when(gate & F.col(key).isNull(), F.lit(value)).otherwise(F.col(key))
            )
        else:
            df = df.withColumn(key, F.when(gate, F.lit(value)))
        return df
    if action == "upsert":
        if key in df.columns:
            return df.withColumn(
                key, F.when(gate, F.lit(value)).otherwise(F.col(key).cast("string"))
            )
        return df.withColumn(key, F.when(gate, F.lit(value)))
    if action == "delete":
        return df.drop(key) if key in df.columns else df
    if action == "rename":
        if key in df.columns:
            return df.withColumnRenamed(key, value)
        return df
    if action == "hash":
        if key in df.columns:
            return df.withColumn(
                key,
                F.when(gate, F.sha2(F.col(key).cast("string"), 256)).otherwise(
                    F.col(key).cast("string")
                ),
            )
        return df
    if action == "extract":
        if key not in df.columns or not pattern:
            return df
        groups = capture_group_indexes(pattern)
        java_rx = to_java_regex(pattern)
        src = F.col(key).cast("string")
        matched = F.coalesce(src.rlike(java_rx), F.lit(False))
        for name, gi in groups.items():
            raw = F.regexp_extract(src, java_rx, gi)
            df = df.withColumn(name, F.when(gate & matched & (raw != ""), raw))
        return df
    if action == "convert":
        if key not in df.columns:
            return df
        t = _CONVERT.get((converted_type or "string").lower(), "string")
        return df.withColumn(key, F.col(key).try_cast(t))
    raise ValueError(f"unknown content_modifier action {action!r}")
