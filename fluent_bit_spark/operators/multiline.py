"""Multiline line-joining (stacktraces, CRI/docker partial lines).

Reference: /root/reference/src/multiline/flb_ml.c + flb_ml_rule.c —
stateful per-stream state machines; built-in parsers cri, docker,
java, go, python plus user regex rules (start_state regex -> cont
regex); match modes regex/endswith/eq (include/fluent-bit/multiline/
flb_ml.h:35-37).

Spark-first: the event-loop state machine becomes a windowed
running-sum sessionization — entirely Catalyst, one shuffle on the
stream key:

    is_start(line)                   (regex / rule mode)
    record_id = sum(is_start) over (key ORDER BY seq)
    groupBy(key, record_id) -> concat ordered lines

CRI/docker 'partial line' semantics close a record at the FULL line
instead of opening one at a start line — same running-sum trick on a
shifted flag. Requires an explicit order column (at 10^12 rows 'file
order' must be data, exactly like in_tail's (inode, offset))."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _joined(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    line_col: str,
    record_id: Column,
    sep: str = "\n",
) -> DataFrame:
    grouped = (
        df.withColumn("_rec", record_id)
        .groupBy(*key_cols, "_rec")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(line_col).alias("l")))
                    ),
                    lambda s: s["l"],
                ),
                sep,
            ).alias("record"),
            F.min(order_col).alias("first_" + order_col),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    return grouped.withColumnRenamed("_rec", "record_id")


def multiline_join(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    line_col: str,
    start_pattern: str,
    sep: str = "\n",
) -> DataFrame:
    """Rule mode: a line matching start_pattern opens a new record;
    every following non-start line continues it. Leading continuation
    lines (before any start) group into record_id 0, mirroring the
    reference flushing unmatched content as-is."""
    is_start = F.coalesce(F.col(line_col).rlike(start_pattern), F.lit(False))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    record_id = F.sum(is_start.cast("long")).over(w)
    return _joined(df, key_cols, order_col, line_col, record_id, sep)


def partial_join(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    line_col: str,
    is_full: Column,
    sep: str = "",
) -> DataFrame:
    """CRI/docker mode: records END at a full line (is_full true);
    partial lines accumulate until one. record_id = count of full
    lines BEFORE the current row (a full line closes its own record).
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    record_id = F.coalesce(F.sum(is_full.cast("long")).over(w), F.lit(0))
    return _joined(df, key_cols, order_col, line_col, record_id, sep)


CRI_RX = r"^([^ ]+) (stdout|stderr) ([PF]) (.*)$"


def cri_join(
    df: DataFrame, key_cols: list[str], order_col: str, line_col: str
) -> DataFrame:
    """CRI log lines '<time> <stream> <P|F> <log>': parse the header
    once (multi-group single pass), join partial chunks until an F
    line (flb_ml_parser_cri.c semantics)."""
    parsed = df.withColumn(
        "_cri",
        F.when(
            F.col(line_col).rlike(CRI_RX),
            F.split(
                F.regexp_replace(F.col(line_col), CRI_RX + ".*", "$1\x01$2\x01$3\x01$4"),
                "\x01",
            ),
        ),
    )
    parsed = (
        parsed.withColumn("_log", F.coalesce(F.element_at("_cri", 4), F.col(line_col)))
        .withColumn("_full", F.coalesce(F.element_at("_cri", 3) == "F", F.lit(True)))
        .withColumn("stream", F.element_at("_cri", 2))
    )
    return partial_join(
        parsed.drop("_cri"),
        key_cols + ["stream"],
        order_col,
        "_log",
        F.col("_full"),
    ).withColumnRenamed("record", "log")


def docker_join(
    df: DataFrame, key_cols: list[str], order_col: str, line_col: str
) -> DataFrame:
    """Docker json-log lines {'log': ..., 'stream': ...}: a record is
    partial while 'log' lacks a trailing newline (flb_ml_parser_docker)."""
    parsed = (
        df.withColumn("_j", F.from_json(F.col(line_col), "log string, stream string"))
        .withColumn("_log", F.col("_j.log"))
        .withColumn("stream", F.col("_j.stream"))
        .withColumn("_full", F.coalesce(F.col("_j.log").endswith("\n"), F.lit(True)))
        .drop("_j")
    )
    out = partial_join(parsed, key_cols + ["stream"], order_col, "_log", F.col("_full"))
    return out.withColumn("log", F.regexp_replace("record", "\n$", "")).drop("record")
