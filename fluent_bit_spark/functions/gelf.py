"""GELF (Graylog Extended Log Format) conversion.

Reference: /root/reference/src/flb_pack_gelf.c — msgpack record ->
GELF JSON: required keys version/"1.1", host, timestamp (epoch double),
short_message; level mapped from syslog severity names; every other
record key becomes an additional field prefixed with '_'
(flb_pack_gelf.c key remapping). Columnar form: one to_json(struct)
expression, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LEVELS = {
    "emerg": 0, "alert": 1, "crit": 2, "error": 3, "err": 3,
    "warning": 4, "warn": 4, "notice": 5, "info": 6, "debug": 7,
}


def gelf_level(level_col: Column) -> Column:
    """Syslog severity name -> numeric level; default 1 ('alert',
    the reference's fallback for unknown strings)."""
    expr = F.lit(1)
    for name, num in _LEVELS.items():
        expr = F.when(F.lower(level_col) == name, F.lit(num)).otherwise(expr)
    return expr


def to_gelf(
    df: DataFrame,
    host_col: str,
    message_col: str,
    ts_col: str,
    level_col: str | None = None,
    extra_cols: list[str] | None = None,
) -> Column:
    """GELF JSON line per record (additional fields '_'-prefixed)."""
    fields = [
        F.lit("1.1").alias("version"),
        F.col(host_col).alias("host"),
        F.col(message_col).alias("short_message"),
        F.col(ts_col).cast("double").alias("timestamp"),
    ]
    if level_col:
        fields.append(gelf_level(F.col(level_col)).alias("level"))
    for c in extra_cols or []:
        fields.append(F.col(c).alias(f"_{c}"))
    return F.to_json(F.struct(*fields))
