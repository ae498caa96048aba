"""The flagship end-to-end pipeline: parse -> enrich -> route -> aggregate.

This is the Spark re-expression of fluent-bit's main query lifecycle
(SURVEY.md §3.1): input chunks -> filter chain -> routes bitmask ->
per-sink flush, plus the stream-processor aggregate tap. One
declarative plan; Catalyst fuses the whole filter chain into a single
WholeStageCodegen pass (vs the reference's per-filter
decode/mutate/re-encode loop, src/flb_filter.c:119-267).

Scale design (10^12 rows):
- parse stage: cheap byte-test format guard FIRST (Sparser-style
  prefilter), then per-format extraction wrapped in when(guard, ...)
  so each row pays only its own format's regex; the one Python stage
  (logfmt) receives a pre-masked column (null for non-logfmt rows) so
  the Arrow batch work is proportional to logfmt rows only.
- enrich: broadcast joins only (see enrich.py).
- fan-out: single-pass exploded write partitioned by sink — the scan
  runs ONCE regardless of sink count; sink predicates are
  constant-folded literals.
- aggregates: groupBy partials combine map-side; the only full
  shuffle in the job is keyed on (sink, window, domain).
- skew: hot domains are salted via pmod(xxhash64(url), N) appended to
  the repartition key; AQE skew-join handles the enrich side.
- resume: deterministic batch column + dynamic partition overwrite
  makes every batch write idempotent; a progress table records
  completed batches (the in_tail SQLite offset table analog,
  plugins/in_tail/tail_sql.h:30-44).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_bit_spark.datagen import format_of
from fluent_bit_spark.enrich import checklist, lookup_join
from fluent_bit_spark.functions.timeparse import time_parse_col
from fluent_bit_spark.parsers.compile import logfmt_map_fast_col, ltsv_map_col
from fluent_bit_spark.router import Route, RewriteTagRule, apply_rewrite_tag, fan_out_exploded

APACHE_RX = (
    r'^(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}) [^ ]* ([^ ]*) \[([^\]]*)\] '
    r'"(\S+)(?: +([^"]*?)(?: +\S*)?)?" ([^ ]*) ([^ ]*)'
)
SYSLOG_RX = r"^<(\d+)>([A-Za-z]{3} [ \d]\d \d\d:\d\d:\d\d) ([^ ]*) ([A-Za-z0-9_\/\.\-]*)(?:\[(\d+)\])?(?:[^\:]*\:)? *(.*)$"


def multi_extract(col: Column, pat: str, n_groups: int) -> Column:
    """All capture groups of an anchored pattern in ONE regex pass.

    ``regexp_extract`` per group re-runs the regex once per group; at
    10^12 rows that multiplies the scan's dominant cost by the group
    count. Instead: one ``rlike`` guard + one ``regexp_replace``
    rewriting the whole line to a \\x01-separated group list, then a
    plain split — 2 regex executions total regardless of group count.
    Returns null when the pattern doesn't match; unmatched optional
    groups come back as empty strings (callers null them via _ga).
    """
    sep = "\x01"
    repl = sep.join(f"${i}" for i in range(1, n_groups + 1))
    # the replace pattern must consume the ENTIRE line so the result
    # is exactly the group list ('(?s)' eats embedded newlines)
    full = pat if pat.endswith("$") else "(?s)" + pat + ".*"
    return F.when(col.rlike(pat), F.split(F.regexp_replace(col, full, repl), sep))


def _ga(arr: Column, i: int) -> Column:
    """Group i (1-based) of a multi_extract array; '' -> null."""
    v = F.element_at(arr, i)
    return F.when(v != "", v)


def parse_stage(df: DataFrame, text_col: str = "text", ref_year: int = 2026) -> DataFrame:
    """Multi-format parse into one unified schema.

    Output adds: fmt, host, user, method, path, code int, size long,
    level, message, event_time, _parse_ok. The reference equivalent is
    filter_parser with N parsers tried per record; here a cheap format
    guard picks the parser per row and only that parser's expressions
    evaluate (Catalyst If short-circuits per row). Everything is
    JVM-side whole-stage codegen: the regex formats use single-pass
    multi_extract, logfmt uses the vectorized Catalyst fast path.
    """
    t = F.col(text_col)
    df = df.withColumn("fmt", format_of(t))
    is_a = F.col("fmt") == "apache"
    is_s = F.col("fmt") == "syslog"
    is_j = F.col("fmt") == "json"
    is_l = F.col("fmt") == "ltsv"
    is_f = F.col("fmt") == "logfmt"

    json_map = F.when(is_j, F.from_json(t, "map<string,string>"))
    # mask non-matching rows so each format pays only for its own rows
    df = (
        df.withColumn("_ltsv_in", F.when(is_l, t))
        .withColumn("_logfmt_in", F.when(is_f, t))
        .withColumn("_aa", multi_extract(F.when(is_a, t), APACHE_RX, 7))
        .withColumn("_sa", multi_extract(F.when(is_s, t), SYSLOG_RX, 6))
        .withColumn("_jm", json_map)
        .withColumn("_lm", ltsv_map_col("_ltsv_in"))
        .withColumn("_fm", logfmt_map_fast_col("_logfmt_in"))
    )
    aa, sa = F.col("_aa"), F.col("_sa")
    jm, lm, fm = F.col("_jm"), F.col("_lm"), F.col("_fm")

    host = (
        F.when(is_a, _ga(aa, 1))
        .when(is_s, _ga(sa, 3))
        .when(is_l, F.element_at(lm, "host"))
    )
    user = F.when(is_a, _ga(aa, 2))
    method = F.when(is_a, _ga(aa, 4))
    path = F.when(is_a, _ga(aa, 5)).when(is_l, F.element_at(lm, "path"))
    code = (
        F.when(is_a, _ga(aa, 6))
        .when(is_l, F.element_at(lm, "status"))
        .when(is_f, F.element_at(fm, "status"))
        .try_cast("int")
    )
    size = (
        F.when(is_a, _ga(aa, 7))
        .when(is_l, F.element_at(lm, "size"))
        .when(is_f, F.element_at(fm, "bytes"))
        .try_cast("long")
    )
    level = F.when(is_f, F.element_at(fm, "level")).when(is_s, _ga(sa, 4))
    message = (
        F.when(is_s, _ga(sa, 6))
        .when(is_j, F.element_at(jm, "log"))
        .when(is_f, F.element_at(fm, "msg"))
    )
    event_time = (
        F.when(is_a, time_parse_col(_ga(aa, 3), "%d/%b/%Y:%H:%M:%S %z"))
        .when(is_s, time_parse_col(_ga(sa, 2), "%b %d %H:%M:%S", ref_year=ref_year))
        .when(is_j, time_parse_col(F.element_at(jm, "time"), "%Y-%m-%dT%H:%M:%S.%L"))
        .when(is_l, time_parse_col(F.element_at(lm, "time"), "%Y-%m-%dT%H:%M:%S.%L"))
        .when(is_f, time_parse_col(F.element_at(fm, "ts"), "%Y-%m-%dT%H:%M:%S.%L"))
    )
    parse_ok = (
        F.when(is_a, aa.isNotNull())
        .when(is_s, sa.isNotNull())
        .when(is_j, jm.isNotNull())
        .when(is_l, F.coalesce(F.size(lm) > 0, F.lit(False)))
        .otherwise(F.coalesce(F.size(fm) > 0, F.lit(False)))
    )

    return (
        df.withColumn("host", host)
        .withColumn("user", user)
        .withColumn("method", method)
        .withColumn("path", path)
        .withColumn("code", code)
        .withColumn("size", size)
        .withColumn("level", level)
        .withColumn("message", message)
        .withColumn("event_time", event_time)
        .withColumn("_parse_ok", F.coalesce(parse_ok, F.lit(False)))
        .drop("_jm", "_lm", "_fm", "_ltsv_in", "_logfmt_in", "_aa", "_sa")
    )


def domain_of(url_col: Column) -> Column:
    return F.parse_url(url_col, F.lit("HOST"))


def tag_stage(df: DataFrame) -> DataFrame:
    """tag = web.<lang>.<tld> (FIXTURES.md §5)."""
    fqdn = domain_of(F.col("url"))
    tld = F.substring_index(fqdn, ".", -1)
    return df.withColumn("domain", fqdn).withColumn(
        "tag", F.concat(F.lit("web."), F.col("lang"), F.lit("."), tld)
    )


DEFAULT_ROUTES = [
    Route("sink_all", "*"),
    Route("sink_en", "web.en.*"),
    Route("sink_com", "*.com"),
    Route("sink_errors", "errors.*"),
]

DEFAULT_REWRITES = [
    RewriteTagRule("$code", r"^5\d\d$", "errors.$TAG[1]", keep=True),
]


@dataclass
class PipelineResult:
    routed: DataFrame
    aggregates: DataFrame
    metrics: DataFrame


def build_pipeline(
    pages: DataFrame,
    geo: DataFrame | None = None,
    watchlist: list[str] | None = None,
    routes: list[Route] | None = None,
    rewrites: list[RewriteTagRule] | None = None,
    ref_year: int = 2026,
    agg_window: str = "1 minute",
    from_html: bool = False,
) -> PipelineResult:
    """Assemble the full logical plan (no actions).

    from_html=True derives ``text`` from the raw ``html`` bytes via
    the JVM extraction chain (textprep/html.html_to_text_col) before
    parsing — the north-rule shape where the pipeline consumes the
    page bytes, with byte-identical extracted text per url. The
    extractor is a narrow codegen projection, so the plan gains no
    exchange and no Python stage.
    """
    if from_html:
        from fluent_bit_spark.textprep.html import html_to_text_col

        pages = pages.withColumn(
            "text", html_to_text_col(F.col("html"), keep="body")
        )
    parsed = parse_stage(pages, ref_year=ref_year)
    tagged = tag_stage(parsed)

    enriched = tagged
    if geo is not None:
        enriched = lookup_join(enriched, geo, key="domain", lookup_key="key")
    if watchlist:
        enriched = checklist(enriched, watchlist, "domain", {"flagged": "true"})

    rewritten = apply_rewrite_tag(enriched, rewrites if rewrites is not None else DEFAULT_REWRITES)
    routed = fan_out_exploded(rewritten, routes or DEFAULT_ROUTES)

    # out_flowcounter per sink: records + bytes per unit time
    aggregates = (
        routed.groupBy(
            F.col("sink"),
            F.window(F.col("warc_ts"), agg_window).alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("records"),
            F.sum(F.length("text")).alias("bytes"),
            F.sum((~F.col("_parse_ok")).cast("long")).alias("parse_failures"),
        )
        .select(
            "sink", F.col("w.start").alias("window_start"), "records", "bytes",
            "parse_failures",
        )
    )

    metrics = (
        routed.groupBy("sink", F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("records_out"),
            F.sum((~F.col("_parse_ok")).cast("long")).alias("parse_failures"),
            F.sum(F.length("text")).alias("bytes"),
        )
        .withColumn("stage", F.lit("route"))
    )
    return PipelineResult(routed=routed, aggregates=aggregates, metrics=metrics)


def run_to_sinks(
    result: PipelineResult, out_dir: str, fmt: str = "parquet"
) -> dict[str, int]:
    """Materialize: one-pass partitioned write + aggregate/metrics
    tables. ``fmt`` is any Spark batch format — locally "parquet";
    on a cluster with the Iceberg runtime on the classpath, pass
    "iceberg" (or swap to ``writeTo(table)`` with a catalog) and the
    plan is unchanged: Iceberg's SparkWrite consumes the same
    partitioned one-pass write."""
    (
        result.routed.write.mode("overwrite")
        .format(fmt)
        .partitionBy("sink")
        .save(os.path.join(out_dir, "sinks"))
    )
    result.aggregates.write.mode("overwrite").format(fmt).save(
        os.path.join(out_dir, "aggregates")
    )
    result.metrics.write.mode("overwrite").format(fmt).save(
        os.path.join(out_dir, "metrics")
    )
    spark = result.routed.sparkSession
    counts = {
        r["sink"]: r["cnt"]
        for r in spark.read.format(fmt)
        .load(os.path.join(out_dir, "sinks"))
        .groupBy("sink")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    return counts


# --------------------------------------------------------------- resume

PROGRESS_SCHEMA = "batch_id int, rows_done long, completed_at timestamp"


def run_resumable(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_batches: int = 8,
    fail_after: int | None = None,
    **pipeline_kwargs,
) -> list[int]:
    """Batch-resumable run: the per-partition watermark analog.

    Input rows are assigned a deterministic batch by url hash; each
    batch is written with dynamic partition overwrite (idempotent on
    retry), then recorded in the progress table. A killed run restarts
    and skips completed batches — no duplicates, no reprocessing.
    ``fail_after`` injects a crash after N batches (for tests).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    progress_path = os.path.join(out_dir, "progress")
    sinks_path = os.path.join(out_dir, "sinks")

    done: set[int] = set()
    try:
        done = {
            r["batch_id"] for r in spark.read.parquet(progress_path).collect()
        }
    except Exception:
        pass

    pages = pages.withColumn(
        "batch_id", F.pmod(F.xxhash64(F.col("url")), F.lit(n_batches)).cast("int")
    )
    ran: list[int] = []
    for b in range(n_batches):
        if b in done:
            continue
        if fail_after is not None and len(ran) >= fail_after:
            raise RuntimeError("injected failure for resume test")
        batch = pages.filter(F.col("batch_id") == b)
        result = build_pipeline(batch.drop("batch_id"), **pipeline_kwargs)
        routed = result.routed.withColumn("batch_id", F.lit(b))
        routed.write.mode("overwrite").partitionBy("batch_id", "sink").parquet(sinks_path)
        n = spark.read.parquet(sinks_path).filter(F.col("batch_id") == b).count()
        spark.createDataFrame(
            [(b, n)], "batch_id int, rows_done long"
        ).withColumn("completed_at", F.current_timestamp()).write.mode("append").parquet(
            progress_path
        )
        ran.append(b)
    return ran
