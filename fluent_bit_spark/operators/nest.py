"""filter_nest: NEST (fold keys under a map) and LIFT (splat a map up).

Reference: /root/reference/plugins/filter_nest/nest.c:86-140 (ops),
:535 (apply_nesting_rules), :631 (callback).

NEST: keys matching any Wildcard pattern move under a new struct
column ``nest_under`` (optionally with prefixes added/removed).
LIFT: fields of struct/map column ``nested_under`` become top-level
columns, optionally renamed with add_prefix/remove_prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluent_bit_spark.functions.globmatch import tag_glob_match


def nest(
    df: DataFrame,
    wildcards: list[str],
    nest_under: str,
    remove_prefix: str | None = None,
    add_prefix: str | None = None,
) -> DataFrame:
    """Fold matching top-level columns into one struct column."""
    matched = [c for c in df.columns if any(tag_glob_match(c, w) for w in wildcards)]
    if not matched:
        return df.withColumn(nest_under, F.lit(None).cast(T.StructType([])))
    fields = []
    for c in matched:
        name = c
        if remove_prefix and name.startswith(remove_prefix):
            name = name[len(remove_prefix):]
        if add_prefix:
            name = add_prefix + name
        fields.append(F.col(c).alias(name))
    return df.withColumn(nest_under, F.struct(*fields)).drop(*matched)


def lift(
    df: DataFrame,
    nested_under: str,
    remove_prefix: str | None = None,
    add_prefix: str | None = None,
) -> DataFrame:
    """Splat a struct column's fields to top level."""
    if nested_under not in df.columns:
        return df
    dtype = df.schema[nested_under].dataType
    if not isinstance(dtype, T.StructType):
        raise ValueError(f"lift expects a struct column, got {dtype}")
    for f in dtype.fieldNames():
        name = f
        if remove_prefix and name.startswith(remove_prefix):
            name = name[len(remove_prefix):]
        if add_prefix:
            name = add_prefix + name
        df = df.withColumn(name, F.col(f"{nested_under}.{f}"))
    return df.drop(nested_under)
