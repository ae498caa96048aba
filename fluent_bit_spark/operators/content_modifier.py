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


def content_modifier(
    df: DataFrame,
    action: str,
    key: str,
    value: str | None = None,
    converted_type: str | None = None,
    pattern: str | None = None,
    conditions: list[ConditionRule] | None = None,
    combine: str = "and",
) -> DataFrame:
    gate: Column = compile_condition(conditions or [], combine)
    action = action.lower()

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
