"""Streaming exact deduplication — the corpus dedup path under
Structured Streaming.

The batch form (``textprep.dedup.exact_dedup``) buffers the whole
input behind one digest groupBy; a stream cannot. Spark's state store
gives two native forms, both keyed on the 16-byte md5 digest so the
per-row state is tiny and partitioned by the shuffle on the digest:

- :func:`dedup_stream_global` — ``dropDuplicates`` on the digest.
  Exact parity with the batch operator (every duplicate ever seen is
  dropped) at the cost of state that grows with the number of
  DISTINCT documents. At 100 TB that is still only
  ``n_distinct * ~50 bytes`` in a RocksDB-backed state store spread
  over the cluster, and it is the right choice when the corpus is
  bounded (a crawl snapshot drained with availableNow).
- :func:`dedup_stream_watermarked` —
  ``dropDuplicatesWithinWatermark``. State is bounded by the event-
  time horizon: a duplicate arriving within ``delay`` of the first
  copy is dropped, one arriving later MAY be re-emitted (its state
  was reclaimed). This is the unbounded-stream choice; the recall
  trade is explicit and tested (test_streaming_dedup.py).

There is no fluent-bit analog (the reference has no dedup surface);
this is LLM-corpus surface per the task brief, the streaming
counterpart of exact_dedup used by the corpus_prep showcase.

Scale notes: both forms shuffle once on the digest (the same exchange
the batch groupBy pays); state lookups are local to the post-shuffle
partition. No Python in the plan — digest and comparison are JVM-side.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_bit_spark.streaming.job import run_stream_to_completion

DIGEST_COL = "digest"


def with_digest(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds the dedup key: md5 hex of the text (matches the batch
    operator and the DuckDB oracle byte-for-byte)."""
    return df.withColumn(DIGEST_COL, F.md5(F.col(text_col)))


def dedup_stream_global(df: DataFrame, text_col: str = "text") -> DataFrame:
    """First-arrival-wins exact dedup over the whole stream history.

    State: one entry per distinct digest, forever (use the
    watermarked form for unbounded streams).
    """
    return with_digest(df, text_col).dropDuplicates([DIGEST_COL])


def dedup_stream_watermarked(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Exact dedup with state bounded by an event-time watermark.

    Duplicates whose event times are within ``delay`` of the first
    copy are dropped; a copy arriving after the watermark passed the
    first copy's timestamp may be re-emitted (bounded-state trade).
    """
    return (
        with_digest(df, text_col)
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark([DIGEST_COL])
    )


def dedup_available_now(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    text_col: str = "text",
    ts_col: str | None = None,
    delay: str = "10 minutes",
    max_files_per_trigger: int | None = None,
    timeout_sec: int = 300,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run a streaming exact dedup to completion over a directory of
    parquet files and return the survivors as a batch DataFrame.

    ``max_files_per_trigger=1`` forces each file into its own
    micro-batch, so duplicates that span files genuinely cross the
    state store between batches — the harness the tests and the
    driver oracle use to prove statefulness rather than accidental
    single-batch dedup.

    ``ts_col=None`` selects the global (unbounded-state) form;
    naming a timestamp column selects the watermarked form.

    ``state_partitions`` bounds the per-micro-batch state-store fixed
    cost for small drains (the shuffle-partition count is captured
    into the checkpoint at first start; a real 100 TB run passes
    None to keep the session's width). Restored after completion.
    """
    reader = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(source_dir)
    if ts_col is None:
        deduped = dedup_stream_global(src, text_col)
    else:
        deduped = dedup_stream_watermarked(src, text_col, ts_col, delay)
    name = "dedup_" + uuid.uuid4().hex[:12]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            deduped.writeStream.outputMode("append")
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


def incremental_dedup_stream(
    stream_df: DataFrame, index_digests: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Continuous-crawl incremental dedup: a streaming batch of new
    documents against a FROZEN accepted-corpus index.

    Two gates, mirroring textprep.clusters.incremental_dedup:
    1. stream-static left-anti-style join on the digest — rows whose
       exact text already exists in the (static, broadcastable) index
       never enter the stream's state;
    2. state-store ``dropDuplicates`` within the stream itself, so
       copies arriving in later micro-batches of the same run dedup
       against first arrivals.

    The static side re-evaluates per micro-batch (Spark stream-static
    join semantics) — at scale, the index is the compact digest table,
    not corpus text."""
    s = with_digest(stream_df, text_col)
    idx = (
        index_digests.select(F.col(DIGEST_COL))
        .distinct()
        .withColumn("_in_idx", F.lit(True))
    )
    fresh = (
        s.join(idx, DIGEST_COL, "left")
        .filter(F.col("_in_idx").isNull())
        .drop("_in_idx")
    )
    return fresh.dropDuplicates([DIGEST_COL])


def incremental_available_now(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    index_digests: DataFrame,
    text_col: str = "text",
    max_files_per_trigger: int | None = 1,
    timeout_sec: int = 300,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drain a directory of parquet micro-batches through
    incremental_dedup_stream and return the survivors as a batch
    DataFrame (memory sink; same harness as dedup_available_now)."""
    reader = spark.readStream.schema(schema).option("recursiveFileLookup", "true")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(source_dir)
    out = incremental_dedup_stream(src, index_digests, text_col)
    name = "incdedup_" + uuid.uuid4().hex[:12]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            out.writeStream.outputMode("append")
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


def write_duplicated_stream_input(
    df: DataFrame,
    out_dir: str,
    dup_filter,
    id_col: str = "doc_id",
    id_offset: int = 1_000_000_000,
) -> str:
    """Materialize ``df`` as two single-file micro-batch inputs:
    batch0 = the originals, batch1 = a duplicated slice (rows matching
    ``dup_filter``, re-keyed by ``id_offset`` so ids stay unique).

    File mtimes are staggered so the file stream source (which orders
    by modification time) replays batch0 before batch1 — survivors are
    deterministically the originals.
    """
    b0 = os.path.join(out_dir, "batch0")
    b1 = os.path.join(out_dir, "batch1")
    df.coalesce(1).write.mode("overwrite").parquet(b0)
    (
        df.filter(dup_filter)
        .withColumn(id_col, F.col(id_col) + F.lit(id_offset))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(b1)
    )
    later = None
    for sub, bump in ((b0, 0), (b1, 60)):
        for f in os.listdir(sub):
            p = os.path.join(sub, f)
            if f.endswith(".parquet"):
                st = os.stat(p)
                os.utime(p, (st.st_atime + bump, st.st_mtime + bump))
                later = p
    return later or out_dir
