"""Ingest-table sources.

Reference mapping (SURVEY.md §2.1): every fluent-bit input plugin
reduces to "tagged rows appear"; here the rows are the Common-Crawl-
style pages table. Batch = in_tail catch-up read; streaming (see
streaming/job.py) = in_tail follow mode; dummy_pages = in_dummy
(plugins/in_dummy/in_dummy.c:70,134-154) as the deterministic
generator used by fixtures and benches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fluent_bit_spark.datagen import generate_pages

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_pages(
    spark: SparkSession,
    path: str,
    enforce_schema: bool = True,
) -> DataFrame:
    """Batch read of the ingest table. ``enforce_schema`` pins the
    five-column contract so upstream drift fails fast instead of
    silently widening the scan (column pruning still applies — the
    parse stage only touches url/warc_ts/text/lang unless html is
    asked for)."""
    if enforce_schema:
        return spark.read.schema(PAGES_SCHEMA).parquet(path)
    return spark.read.parquet(path)


def dummy_pages(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """in_dummy: deterministic synthetic pages (datagen.generate_pages)."""
    return generate_pages(spark, n_rows, partitions)
