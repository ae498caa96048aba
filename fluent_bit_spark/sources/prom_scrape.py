"""in_prometheus_scrape: Prometheus exposition-text parsing.

Reference: /root/reference/plugins/in_prometheus_scrape (the HTTP
scraper hands the body to cmetrics' cmt_decode_prometheus, which
implements the text exposition format) — also the decode side of the
in_nginx_exporter_metrics / in_node_exporter_metrics targets.

Text format parsed here (the public exposition spec the decoder
follows):
- ``# HELP <name> <text>`` / ``# TYPE <name> <counter|gauge|
  histogram|summary|untyped>`` annotate the family; other ``#`` lines
  are comments;
- samples: ``name{label="value",...} value [timestamp_ms]`` — label
  values carry ``\\\\``/``\\"``/``\\n`` escapes; the value accepts
  ``NaN``/``+Inf``/``-Inf``;
- histogram/summary families own their ``_bucket``/``_sum``/
  ``_count`` suffixed series.

Everything runs in Catalyst: one regex pass per line for the sample
shape, ``regexp_extract_all`` + ``map_from_arrays`` for labels, and
the TYPE/HELP annotations attach through a broadcast equi-join (the
histogram/summary suffix rule is handled by EXPANDING the annotation
table with the suffixed names, so the join never degrades to a
nested loop at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SAMPLE_RE = (
    r"^([a-zA-Z_:][a-zA-Z0-9_:]*)"          # metric name
    r"(?:\{(.*)\})?"                         # labels blob
    r"\s+(NaN|[+-]?Inf|[+-]?[0-9.eE+-]+)"    # value
    r"(?:\s+([0-9]+))?\s*$"                  # optional ms timestamp
)
_LABEL_RE = r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:[^"\\]|\\.)*)"'
_META_RE = r"^#\s+(HELP|TYPE)\s+(\S+)\s+(.*)$"


def _unescape(col):
    # label value escapes: \\ , \" , \n (exposition spec)
    out = F.regexp_replace(col, r"\\n", "\n")
    out = F.regexp_replace(out, r'\\"', '"')
    return F.regexp_replace(out, r"\\\\", "\\\\")


def _meta_table(base, kind: str, out_name: str):
    rows = base.filter(
        (F.col("_meta_kind") == kind) & (F.col("_meta_name") != "")
    ).select(
        F.col("_meta_name").alias("name"),
        F.col("_meta_text").alias(out_name),
    ).dropDuplicates(["name"])
    if kind == "TYPE":
        # histogram/summary families own _bucket/_sum/_count series:
        # expand the annotation to those names so attachment is a
        # plain equi-join
        suffixed = rows.filter(
            F.col(out_name).isin("histogram", "summary")
        ).select(
            F.explode(F.array(
                F.concat(F.col("name"), F.lit("_bucket")),
                F.concat(F.col("name"), F.lit("_sum")),
                F.concat(F.col("name"), F.lit("_count")),
            )).alias("name"),
            F.col(out_name),
        )
        rows = rows.unionByName(suffixed).dropDuplicates(["name"])
    return rows


def parse_prometheus_text(
    df: DataFrame, line_col: str = "line"
) -> DataFrame:
    """Exposition lines -> (name, labels map, value, ts_ms, mtype,
    help) sample rows."""
    line = F.trim(F.col(line_col))
    base = (
        df.withColumn("_line", line)
        .withColumn("_name", F.regexp_extract(line, _SAMPLE_RE, 1))
        .withColumn("_meta_kind", F.regexp_extract(line, _META_RE, 1))
        .withColumn("_meta_name", F.regexp_extract(line, _META_RE, 2))
        .withColumn("_meta_text", F.regexp_extract(line, _META_RE, 3))
    )

    raw_val = F.regexp_extract(F.col("_line"), _SAMPLE_RE, 3)
    ts = F.regexp_extract(F.col("_line"), _SAMPLE_RE, 4)
    blob = F.regexp_extract(F.col("_line"), _SAMPLE_RE, 2)
    samples = base.filter(
        (F.col("_name") != "") & ~F.col("_line").startswith("#")
    ).select(
        F.col("_name").alias("name"),
        F.map_from_arrays(
            F.regexp_extract_all(blob, F.lit(_LABEL_RE), F.lit(1)),
            F.transform(
                F.regexp_extract_all(blob, F.lit(_LABEL_RE), F.lit(2)),
                _unescape,
            ),
        ).alias("labels"),
        F.when(raw_val == "NaN", float("nan"))
        .when(raw_val.isin("+Inf", "Inf"), float("inf"))
        .when(raw_val == "-Inf", float("-inf"))
        .otherwise(raw_val.try_cast("double")).alias("value"),
        F.when(ts != "", ts.cast("long")).alias("ts_ms"),
    )

    types = _meta_table(base, "TYPE", "mtype")
    helps = _meta_table(base, "HELP", "help")
    out = samples.join(F.broadcast(types), "name", "left")
    out = out.join(F.broadcast(helps), "name", "left")
    return out
