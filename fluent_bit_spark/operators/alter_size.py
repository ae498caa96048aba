"""filter_alter_size: add or remove N records per chunk.

Reference: plugins/filter_alter_size/alter_size.c — ``Add N`` appends
N records shaped {"key": "alter_size <i>"} to each chunk (current
timestamp); ``Remove N`` keeps only the chunk's first total-N records
(the LAST N drop); add and remove are mutually exclusive (:78-80).

The chunk analog here is an explicit grouping (tag or (tag, window));
ordering within a chunk comes from ``order_col`` — the columnar
equivalents of chunk identity and record order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def alter_size(
    df: DataFrame,
    add: int = 0,
    remove: int = 0,
    chunk_cols: list[str] | None = None,
    order_col: str | None = None,
    tag_col: str = "tag",
    key_col: str = "key",
    gate=None,
) -> DataFrame:
    """``gate`` (classic Match scoping) selects which chunks are
    altered — it is tag-derived, hence constant per chunk."""
    if add > 0 and remove > 0:
        raise ValueError("cannot use 'add' and 'remove' at the same time")
    chunk_cols = chunk_cols or [tag_col]
    if remove > 0:
        if order_col is None:
            raise ValueError("remove needs order_col (chunk record order)")
        w = Window.partitionBy(*chunk_cols).orderBy(F.col(order_col).desc())
        keep = F.col("_rn_last") > remove
        if gate is not None:
            keep = ~gate | keep
        return (
            df.withColumn("_rn_last", F.row_number().over(w))
            .filter(keep)
            .drop("_rn_last")
        )
    if add > 0:
        src = df if gate is None else df.filter(gate)
        chunks = src.select(*chunk_cols).distinct()
        extra = chunks.crossJoin(
            df.sparkSession.range(add).select(F.col("id").alias("_i"))
        ).select(
            *chunk_cols,
            F.concat(F.lit("alter_size "), F.col("_i").cast("string")).alias(
                key_col
            ),
        )
        return df.unionByName(extra, allowMissingColumns=True)
    return df
