"""filter_expect: in-pipeline assertions.

Reference: /root/reference/plugins/filter_expect/expect.c:35-75
(rules key_exists / key_not_exists / key_val_is_null /
key_val_is_not_null / key_val_eq), :164-186 (actions warn / exit /
result_key).

Spark: each rule compiles to a violation predicate; ``expect`` either
raises (action='exit'), adds a boolean result column
(action='result_key'), or returns violation counts (action='warn').
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.functions.accessor import ra_col


@dataclass
class ExpectRule:
    op: str  # key_exists|key_not_exists|key_val_is_null|key_val_is_not_null|key_val_eq
    key: str
    value: str | None = None


def _violated(df: DataFrame, r: ExpectRule) -> Column:
    name = r.key.lstrip("$").split("[")[0]
    present = name in df.columns
    op = r.op.lower()
    if op == "key_exists":
        return ~ra_col(r.key).isNotNull() if present else F.lit(True)
    if op == "key_not_exists":
        return ra_col(r.key).isNotNull() if present else F.lit(False)
    if op == "key_val_is_null":
        return ra_col(r.key).isNotNull() if present else F.lit(False)
    if op == "key_val_is_not_null":
        return ra_col(r.key).isNull() if present else F.lit(True)
    if op == "key_val_eq":
        if not present:
            return F.lit(True)
        return ~F.coalesce(ra_col(r.key).cast("string") == F.lit(r.value), F.lit(False))
    raise ValueError(f"unknown expect rule {r.op!r}")


def expect(
    df: DataFrame,
    rules: list[ExpectRule],
    action: str = "exit",
    result_key: str = "matched",
) -> DataFrame | dict[str, int]:
    if action == "result_key":
        ok = F.lit(True)
        for r in rules:
            ok = ok & ~_violated(df, r)
        return df.withColumn(result_key, ok)
    if action == "warn":
        agg = df.agg(
            *[F.sum(_violated(df, r).cast("long")).alias(f"rule_{i}") for i, r in enumerate(rules)]
        ).collect()[0]
        return {f"rule_{i}": agg[f"rule_{i}"] or 0 for i in range(len(rules))}
    # action == "exit": raise on first violation (reference aborts the pipeline)
    viol = F.lit(False)
    for r in rules:
        viol = viol | _violated(df, r)
    n = df.filter(viol).count()
    if n:
        raise AssertionError(f"filter_expect: {n} records violate expectations")
    return df
