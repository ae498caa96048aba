"""Deterministic Common-Crawl-style pages generator (FIXTURES.md §1).

Produces the pipeline ingest table
``(url string, warc_ts timestamp, html binary, text string, lang string)``
entirely with JVM-side expressions over ``spark.range(n)`` — no Python
per row, no RNG state: every value is a pure function of the row id
and the seed, so any scale factor regenerates identically on any
cluster size (the reference's in_dummy generator with fixed samples,
plugins/in_dummy/in_dummy.c:70,134-154, scaled up).

Skew is intentional: domains are drawn from a power-law so hot
domains exist (exercises salting/AQE at scale — north rule). ``text``
cycles through the five reference line formats (apache, syslog-rfc3164,
docker JSON, ltsv, logfmt) so every parser has coverage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
N_DOMAINS = 1000
LANGS = ["en", "es", "de", "fr", "ja"]
TLDS = ["com", "org", "net", "io", "dev"]
BASE_TS = "2026-01-01 00:00:00"

FORMATS = ["apache", "syslog", "json", "ltsv", "logfmt"]


def _h(seed_tag: str, *cols: Column) -> Column:
    """Deterministic 64-bit hash stream, one per purpose tag."""
    return F.abs(F.xxhash64(F.lit(SEED), F.lit(seed_tag), *cols))


def _domain(id_col: Column) -> Column:
    """Power-law domain index: u^3 concentrates mass near 0 -> the
    low-numbered domains are hot (Zipf-ish skew)."""
    u = (_h("domain", id_col) % 1_000_000) / 1_000_000.0
    idx = F.floor(F.pow(u, F.lit(3.0)) * N_DOMAINS).cast("int")
    return F.concat(F.lit("site"), idx.cast("string"))


def _pick(seed_tag: str, id_col: Column, values: list[str]) -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_h(seed_tag, id_col) % len(values) + 1).cast("int"))


def generate_pages(
    spark: SparkSession,
    n_rows: int,
    partitions: int | None = None,
) -> DataFrame:
    df = (
        spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
        .withColumnRenamed("id", "rid")
    )
    rid = F.col("rid")

    domain = _domain(rid)
    tld = _pick("tld", rid, TLDS)
    lang = _pick("lang", rid, LANGS)
    fqdn = F.concat(domain, F.lit("."), tld)
    url = F.concat(
        F.lit("https://"), fqdn, F.lit("/page/"), rid.cast("string")
    )
    # monotone-ish timestamps: one hour of traffic, jittered
    warc_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(BASE_TS), "yyyy-MM-dd HH:mm:ss")
        + (rid % 3600)
        + (_h("jitter", rid) % 1000) / 1000.0
    )

    # ---- embedded log line, one of the 5 reference formats ----
    ip = F.concat_ws(
        ".",
        (_h("ip1", rid) % 223 + 1).cast("string"),
        (_h("ip2", rid) % 255).cast("string"),
        (_h("ip3", rid) % 255).cast("string"),
        (_h("ip4", rid) % 255).cast("string"),
    )
    user = _pick("user", rid, ["alice", "bob", "carol", "-", "dave"])
    method = _pick("method", rid, ["GET", "GET", "GET", "POST", "PUT", "DELETE"])
    path = F.concat(F.lit("/"), _pick("p1", rid, ["api", "static", "blog", "img"]),
                    F.lit("/"), (_h("p2", rid) % 500).cast("string"))
    code = _pick("code", rid, ["200", "200", "200", "200", "301", "404", "500", "503"])
    size = (_h("size", rid) % 50000 + 64).cast("string")
    apache_time = F.date_format(warc_ts, "dd/MMM/yyyy:HH:mm:ss Z")
    iso_time = F.date_format(warc_ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    syslog_time = F.date_format(warc_ts, "MMM dd HH:mm:ss")
    level = _pick("level", rid, ["info", "warn", "error", "debug"])

    apache_line = F.format_string(
        '%s - %s [%s] "%s %s HTTP/1.1" %s %s "-" "Mozilla/5.0"',
        ip, user, apache_time, method, path, code, size,
    )
    syslog_line = F.format_string(
        "<%s>%s host%s app-%s[%s]: %s request %s handled",
        (_h("pri", rid) % 191).cast("string"), syslog_time,
        (_h("hostn", rid) % 20).cast("string"), level,
        (_h("pid", rid) % 32768).cast("string"), method, path,
    )
    json_line = F.to_json(
        F.struct(
            F.format_string("%s %s -> %s", method, path, code).alias("log"),
            _pick("stream", rid, ["stdout", "stderr"]).alias("stream"),
            iso_time.alias("time"),
        )
    )
    ltsv_line = F.format_string(
        "time:%s\thost:%s\tstatus:%s\tsize:%s\tpath:%s",
        iso_time, ip, code, size, path,
    )
    logfmt_line = F.format_string(
        'ts=%s level=%s msg="%s %s" status=%s bytes=%s',
        iso_time, level, method, path, code, size,
    )

    fmt_idx = (rid % 5).cast("int")
    text = (
        F.when(fmt_idx == 0, apache_line)
        .when(fmt_idx == 1, syslog_line)
        .when(fmt_idx == 2, json_line)
        .when(fmt_idx == 3, ltsv_line)
        .otherwise(logfmt_line)
    )

    # text is HTML-escaped into the page body so extraction
    # (textprep/html.html_to_text_col) recovers it byte-identically —
    # the north-rule per-url invariant (syslog lines start with '<')
    from fluent_bit_spark.textprep.html import escape_html_col

    html = F.concat(
        F.lit("<html><head><title>"), fqdn,
        F.lit("</title></head><body><pre>"), escape_html_col(text),
        F.lit("</pre></body></html>"),
    ).cast("binary")

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def write_pages(spark: SparkSession, n_rows: int, out_dir: str,
                partitions: int | None = None) -> None:
    generate_pages(spark, n_rows, partitions).write.mode("overwrite").parquet(out_dir)


def format_of(text_col: Column) -> Column:
    """Cheap per-row format guard (Sparser-style prefilter, SURVEY §4:
    'filter before parse') — byte tests only, no regex."""
    return (
        F.when(text_col.startswith("{"), F.lit("json"))
        .when(text_col.startswith("<"), F.lit("syslog"))
        .when(text_col.contains("\t"), F.lit("ltsv"))
        .when(text_col.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3} "), F.lit("apache"))
        .otherwise(F.lit("logfmt"))
    )
