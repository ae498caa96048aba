"""Skew handling: salted repartitioning for hot keys (north rule).

Web-domain traffic is Zipf-distributed — a handful of hot domains can
hold orders of magnitude more rows than the median. Hash-partitioning
on the raw domain then sends a whole hot domain to one task. Two
mitigations compose here:

1. AQE skew-join splitting (enabled in session.py) fixes skewed JOIN
   partitions at runtime.
2. Salted repartitioning fixes skewed WRITES and groupBys that AQE
   can't split (a single group key can't be divided without algebra):
   append a salt in [0, n_salts) derived from a stable row hash, so a
   hot key spreads over n_salts tasks. For aggregates, run the
   partial aggregate on (key, salt) first, then combine — both stages
   map-side-combine, the second shuffle carries n_salts rows per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(n_salts: int, *stable_cols: str | Column) -> Column:
    """Deterministic salt in [0, n_salts): stable across retries.

    The guarantee only holds if ``stable_cols`` are themselves
    deterministic row content — never monotonically_increasing_id(),
    whose values change when a stage retries (a salted repartition
    would then land replayed rows in different partitions: lost or
    duplicated rows under partitionBy-style writes)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in stable_cols]
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def _all_cols_salt(df: DataFrame, n_salts: int) -> Column:
    """Default retry-stable salt: xxhash64 over every column — pure
    row content, identical on task replay (unlike
    monotonically_increasing_id)."""
    return salt_col(n_salts, *[F.col(c) for c in df.columns])


def salted_repartition(
    df: DataFrame,
    key_col: str,
    n_salts: int = 16,
    stable_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition on (key, salt) so hot keys spread over n_salts
    tasks (e.g. before a partitionBy(domain) write). Pass
    ``num_partitions`` to pin the count — without it AQE may coalesce
    a small-byte shuffle onto few tasks (harmless at scale, where the
    hot key's bytes exceed the advisory size, but surprising in
    tests/small runs)."""
    salt = (
        salt_col(n_salts, *stable_cols)
        if stable_cols
        else _all_cols_salt(df, n_salts)
    )
    df = df.withColumn("_salt", salt)
    if num_partitions:
        df = df.repartition(num_partitions, F.col(key_col), F.col("_salt"))
    else:
        df = df.repartition(F.col(key_col), F.col("_salt"))
    return df.drop("_salt")


def salted_count_sum(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: dict[str, str] | None = None,
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-stage skew-proof aggregate: partial on (keys, salt), final
    on keys. Output: count `records` + requested sums. Algebraically
    identical to a direct groupBy; the first shuffle spreads each hot
    key over n_salts partitions.
    """
    sum_cols = sum_cols or {}
    salt = (
        salt_col(n_salts, salt_source)
        if salt_source
        else _all_cols_salt(df, n_salts)
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_pc"),
            *[F.sum(src).alias(f"_ps_{dst}") for dst, src in sum_cols.items()],
        )
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_pc").alias("records"),
        *[F.sum(f"_ps_{dst}").alias(dst) for dst in sum_cols],
    )
