"""Streaming LLM-corpus pipeline: the corpus_prep composite under
Structured Streaming — the north-rule job shape end to end.

readStream over the (url, warc_ts, html, text, lang) page table ->
JVM html-to-text extraction (byte-identical invariant) -> streaming
exact dedup on the text digest (dropDuplicatesWithinWatermark) ->
integer quality gates + language-ID (stateless codegen) -> windowed
per-domain/language corpus card (event-time tumbling window).

This chains TWO stateful operators (dedup then windowed aggregate),
which Spark supports in append mode when both key on event time under
one watermark. Output rows are finalized card windows; the still-open
trailing window is withheld until the watermark passes it — exactly
the semantics a resumable 100 TB crawl-ingest job wants (cards for
closed hours are immutable, the open hour is not emitted).

Scale: dedup state is one digest per distinct doc within the
watermark horizon; the card's state is (window, domain, lang) — tiny.
Both shuffles key on their state keys; everything between is
whole-stage codegen (no Python anywhere in the plan).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_bit_spark.streaming.job import PAGES_SCHEMA, run_stream_to_completion
from fluent_bit_spark.textprep.html import html_to_text_col
from fluent_bit_spark.textprep.textstats import lang_id_col, token_count_cols


def corpus_gates(df: DataFrame) -> DataFrame:
    """The stateless gate + lang-ID + domain stage (shared by the
    batch corpus_prep oracle path and the streaming form): integer
    quality gates (ws_tokens >= 3, alpha chars >= half), language-ID,
    and the url -> domain projection."""
    kept = lang_id_col(token_count_cols(df))
    kept = kept.withColumn(
        "alpha_chars",
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("bigint"),
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    gated = kept.filter(
        (F.col("ws_tokens") >= 3)
        & (F.col("alpha_chars") * 2 >= F.col("n_chars"))
    )
    return gated.withColumn(
        "domain", F.regexp_extract("url", "https://([^/]+)/", 1)
    )


def corpus_card_stream(
    pages: DataFrame,
    watermark_delay: str = "2 hours",
    window_duration: str = "1 hour",
) -> DataFrame:
    """The full streaming corpus pipeline; returns the windowed
    per-domain/language card (append-mode: finalized windows only)."""
    base = pages.select(
        "url",
        "warc_ts",
        html_to_text_col(F.col("html"), keep="body").alias("text"),
    )
    deduped = (
        base.withColumn("digest", F.md5("text"))
        .withWatermark("warc_ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["digest"])
    )
    gated = corpus_gates(deduped)
    return (
        gated.groupBy(
            F.window("warc_ts", window_duration).alias("w"),
            "domain",
            "pred_lang",
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_tokens").cast("bigint").alias("total_ws_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("alpha_chars").alias("total_alpha_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "domain",
            "pred_lang",
            "n_docs",
            "total_ws_tokens",
            "total_chars",
            "total_alpha_chars",
        )
    )


def write_replay_batches(dfs: list[DataFrame], out_dir: str) -> None:
    """Materialize each DataFrame as one single-file micro-batch
    input (batch0, batch1, ...), mtimes staggered so the file stream
    source replays them in list order."""
    import os

    for i, df in enumerate(dfs):
        sub = os.path.join(out_dir, f"batch{i}")
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        for f in os.listdir(sub):
            if f.endswith(".parquet"):
                p = os.path.join(sub, f)
                st = os.stat(p)
                os.utime(p, (st.st_atime + 60 * i, st.st_mtime + 60 * i))


def corpus_card_start(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "2 hours",
    window_duration: str = "1 hour",
    max_files_per_trigger: int | None = None,
):
    """Durable form: append finalized card windows to parquet with a
    checkpoint. A killed/restarted run resumes from the checkpoint —
    already-processed source files are not re-read and the dedup +
    window STATE carries over (the resume test proves a duplicate
    arriving after restart is still dropped by pre-restart state)."""
    reader = spark.readStream.schema(PAGES_SCHEMA).option(
        "recursiveFileLookup", "true"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    card = corpus_card_stream(
        reader.parquet(source_dir), watermark_delay, window_duration
    )
    return (
        card.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def corpus_card_available_now(
    spark: SparkSession,
    source_dir: str,
    watermark_delay: str = "2 hours",
    window_duration: str = "1 hour",
    max_files_per_trigger: int | None = None,
    timeout_sec: int = 300,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drain a page directory through the streaming corpus pipeline
    and return the finalized card windows as a batch DataFrame.

    ``state_partitions`` bounds the two stateful operators' per-batch
    state-store fixed cost for small drains (captured at first start;
    pass None on a real cluster). Restored after completion."""
    reader = spark.readStream.schema(PAGES_SCHEMA).option(
        "recursiveFileLookup", "true"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    card = corpus_card_stream(
        reader.parquet(source_dir), watermark_delay, window_duration
    )
    name = "corpus_" + uuid.uuid4().hex[:12]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            card.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        run_stream_to_completion(q, timeout_sec)
    finally:
        if state_partitions:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
