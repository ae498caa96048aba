"""Sink encodings: out_file's line formats, re-expressed columnar.

Reference: /root/reference/plugins/out_file/file.c:97-135 (format
selection), :162 (csv), :199 (ltsv), :229-289 (template), plus the
JSON family of flb_pack_msgpack_to_json_format (src/flb_pack.c:918,
date formats include/fluent-bit/flb_pack.h:39-49).

Each encoder maps a DataFrame to a single ``line: string`` column (+
optional tag partitioning); delivery is then any Spark text/parquet
write — ``write_per_tag`` mirrors out_file's file-per-tag layout with
one partitioned pass. At scale prefer columnar sinks (parquet/
Iceberg); these text encoders exist for reference-format parity.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_lines(df: DataFrame, ts_col: str | None = None, date_key: str = "date") -> Column:
    """'json_lines' format: one JSON object per record; the event time
    is injected under date_key as epoch double (flb_pack.h:39 double)."""
    cols = [c for c in df.columns if c != ts_col]
    fields = [F.col(c) for c in cols]
    if ts_col:
        return F.to_json(
            F.struct(F.col(ts_col).cast("double").alias(date_key), *fields)
        )
    return F.to_json(F.struct(*fields))


def csv_line(df: DataFrame, columns: list[str] | None = None) -> Column:
    """out_file csv: comma-joined values, quotes around strings that
    need them left to the writer; nulls empty (file.c:162-197)."""
    cols = columns or df.columns
    return F.concat_ws(",", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols])


def ltsv_line(df: DataFrame, columns: list[str] | None = None) -> Column:
    """out_file ltsv: label:value TAB-joined (file.c:199-227)."""
    cols = columns or df.columns
    parts = [
        F.concat(F.lit(f"{c}:"), F.coalesce(F.col(c).cast("string"), F.lit("")))
        for c in cols
    ]
    return F.concat_ws("\t", *parts)


_TPL_VAR = re.compile(r"\{([A-Za-z0-9_.]+)\}")


def template_line(df: DataFrame, template: str, ts_col: str | None = None) -> Column:
    """out_file template: '{time} {key}...' substitution
    (file.c:229-289; unknown keys render literally, like the
    reference leaving '{missing}' in place)."""
    pieces: list[Column] = []
    pos = 0
    for m in _TPL_VAR.finditer(template):
        if m.start() > pos:
            pieces.append(F.lit(template[pos : m.start()]))
        name = m.group(1)
        if name == "time" and ts_col:
            pieces.append(F.col(ts_col).cast("double").cast("string"))
        elif name in df.columns:
            pieces.append(F.coalesce(F.col(name).cast("string"), F.lit("")))
        else:
            pieces.append(F.lit(m.group(0)))
        pos = m.end()
    if pos < len(template):
        pieces.append(F.lit(template[pos:]))
    return F.concat(*pieces) if pieces else F.lit("")


ENCODERS = {
    "json_lines": json_lines,
    "csv": csv_line,
    "ltsv": ltsv_line,
}


def write_per_tag(
    df: DataFrame,
    out_dir: str,
    fmt: str = "json_lines",
    tag_col: str = "tag",
    template: str | None = None,
    ts_col: str | None = None,
) -> None:
    """File-per-tag delivery in ONE partitioned pass (the out_file
    directory layout without N scans)."""
    if fmt == "template":
        if not template:
            raise ValueError("template format needs a template string")
        line = template_line(df, template, ts_col)
    elif fmt in ENCODERS:
        line = ENCODERS[fmt](df) if fmt != "json_lines" else json_lines(df, ts_col)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    (
        df.withColumn("value", line)
        .select(tag_col, "value")
        .write.mode("overwrite")
        .partitionBy(tag_col)
        .text(os.path.join(out_dir))
    )
