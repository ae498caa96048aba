"""processor_sql: the in-pipeline SQL processor (projection + filter).

Reference: /root/reference/plugins/processor_sql/parser/sql-parser.y
:33-79 and sql.c:573,655 — a deliberately reduced grammar: SELECT
keys FROM STREAM:x WHERE cond. Despite the shared tokens with the
stream processor it supports NO aggregates, windows or GROUP BY
(sql.c executes projection+condition per record only).

We reuse the full SP front-end (sp/parser.py) and reject the forms
the reference's processor can't express, then translate — so the
accepted surface matches the reference exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from fluent_bit_spark.sp.parser import parse_sql
from fluent_bit_spark.sp.translate import translate


def processor_sql(
    df: DataFrame,
    sql: str,
    ts_col: str = "event_time",
    tag_col: str = "tag",
) -> DataFrame:
    cmd = parse_sql(sql)
    if any(k.aggr for k in cmd.keys):
        raise ValueError("processor_sql supports no aggregates (sql.c:573)")
    if cmd.window is not None:
        raise ValueError("processor_sql supports no windows")
    if cmd.group_by:
        raise ValueError("processor_sql supports no GROUP BY")
    return translate(cmd, df, ts_col=ts_col, tag_col=tag_col)
