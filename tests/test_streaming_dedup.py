"""Streaming exact dedup: cross-micro-batch statefulness, watermarked
state expiry (bounded-state re-emission), and batch parity."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.streaming.dedup import (
    dedup_available_now,
    write_duplicated_stream_input,
)

DOCS_SCHEMA = "doc_id long, ts timestamp, text string"


def _write_batch(spark, rows, path, mtime_bump=0):
    df = spark.createDataFrame(rows, DOCS_SCHEMA.replace(" timestamp", " string"))
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("overwrite").parquet(path)
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            p = os.path.join(path, f)
            st = os.stat(p)
            os.utime(p, (st.st_atime + mtime_bump, st.st_mtime + mtime_bump))


def test_global_dedup_crosses_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch0: three docs, one internal dup; batch1: re-sends doc "a"
    _write_batch(
        spark,
        [
            (1, "2026-01-01 00:00:00", "alpha"),
            (2, "2026-01-01 00:00:01", "beta"),
            (3, "2026-01-01 00:00:02", "alpha"),
        ],
        os.path.join(src, "b0"),
    )
    _write_batch(
        spark,
        [
            (4, "2026-01-01 00:01:00", "alpha"),
            (5, "2026-01-01 00:01:01", "gamma"),
        ],
        os.path.join(src, "b1"),
        mtime_bump=60,
    )
    out = dedup_available_now(
        spark, src, DOCS_SCHEMA, max_files_per_trigger=1
    )
    rows = {r.text: r.doc_id for r in out.collect()}
    # "alpha" survived exactly once and from the FIRST micro-batch:
    # the duplicate in b1 was dropped by state carried across batches
    assert set(rows) == {"alpha", "beta", "gamma"}
    assert rows["alpha"] in (1, 3)  # not 4
    assert rows["gamma"] == 5


def test_watermarked_dedup_expires_state(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(
        spark,
        [
            (1, "2026-01-01 00:00:00", "alpha"),
            (2, "2026-01-01 00:00:05", "alpha"),  # within delay: dropped
            (3, "2026-01-01 00:00:06", "beta"),
        ],
        os.path.join(src, "b0"),
    )
    # the watermark visible to a batch comes from the PREVIOUS batch's
    # data, so an intermediate batch advances it past alpha/beta's
    # state expiry (ts + 10s) before the late duplicates arrive
    _write_batch(
        spark,
        [(9, "2026-01-01 01:00:00", "delta")],
        os.path.join(src, "b1"),
        mtime_bump=60,
    )
    # state eviction runs at END of a batch with that batch's
    # watermark, so a second advancer batch is what actually evicts
    # alpha/beta before the late duplicates arrive
    _write_batch(
        spark,
        [(10, "2026-01-01 01:30:00", "epsilon")],
        os.path.join(src, "b2"),
        mtime_bump=120,
    )
    _write_batch(
        spark,
        [
            (4, "2026-01-01 02:00:00", "alpha"),
            (5, "2026-01-01 02:00:01", "beta"),
        ],
        os.path.join(src, "b3"),
        mtime_bump=180,
    )
    out = dedup_available_now(
        spark,
        src,
        DOCS_SCHEMA,
        ts_col="ts",
        delay="10 seconds",
        max_files_per_trigger=1,
    )
    ids = sorted(r.doc_id for r in out.collect())
    # 1 (first alpha), 3 (first beta); 2 dropped (dup within delay);
    # 4 and 5 re-admitted after state expiry — bounded-state semantics
    assert ids == [1, 3, 4, 5, 9, 10]


def test_duplicated_input_helper_and_batch_parity(spark, tmp_path):
    src = str(tmp_path / "src")
    base = spark.createDataFrame(
        [(i, f"doc {i % 7}") for i in range(40)], "doc_id long, text string"
    )
    write_duplicated_stream_input(
        base, src, F.col("doc_id") % 4 == 0, id_col="doc_id"
    )
    out = dedup_available_now(
        spark,
        src,
        "doc_id long, text string",
        max_files_per_trigger=1,
    )
    got = {(r.digest, r.doc_id) for r in out.select("digest", "doc_id").collect()}
    # parity with the batch operator: same survivor digests
    expect_digests = {
        r.digest
        for r in base.select(F.md5("text").alias("digest")).distinct().collect()
    }
    assert {d for d, _ in got} == expect_digests
    # every survivor is an original (batch0 arrived first)
    assert all(i < 1_000_000_000 for _, i in got)


def test_incremental_dedup_stream_gates(spark, tmp_path):
    """Stream-static index gate + cross-batch state store: copies of
    index docs never emit, duplicates across micro-batches emit once."""
    from fluent_bit_spark.streaming.dedup import (
        incremental_available_now,
        with_digest,
    )

    index = spark.createDataFrame(
        [(1, "already accepted text one"), (2, "already accepted text two")],
        "doc_id long, text string",
    )
    # batch 0: one genuinely new doc, one copy of an index doc
    _write_batch(
        spark,
        [(10, "2026-01-01", "brand new text"), (11, "2026-01-01", "already accepted text one")],
        str(tmp_path / "b0"),
    )
    # batch 1: a re-keyed copy of the new doc (state-store dup) + new
    _write_batch(
        spark,
        [(20, "2026-01-01", "brand new text"), (21, "2026-01-01", "second new text")],
        str(tmp_path / "b1"),
        mtime_bump=60,
    )
    out = incremental_available_now(
        spark,
        str(tmp_path),
        DOCS_SCHEMA,
        with_digest(index).select("digest"),
        max_files_per_trigger=1,
    )
    rows = {r["doc_id"] for r in out.collect()}
    assert rows == {10, 21}


def test_watermarked_dedup_under_rocksdb_state_store(spark, tmp_path):
    """use_rocksdb_state_store flips the provider session-wide; the
    watermarked dedup must behave identically under it (VERDICT r3 #7
    — RocksDB is the 100x key-cardinality state backend)."""
    from fluent_bit_spark.streaming.job import (
        ROCKSDB_PROVIDER,
        use_rocksdb_state_store,
    )

    src = str(tmp_path / "src")
    _write_batch(
        spark,
        [
            (1, "2026-01-01 00:00:00", "alpha"),
            (2, "2026-01-01 00:00:05", "alpha"),
            (3, "2026-01-01 00:00:06", "beta"),
        ],
        os.path.join(src, "b0"),
    )
    _write_batch(
        spark,
        [(4, "2026-01-01 00:01:00", "alpha"), (5, "2026-01-01 00:01:01", "gamma")],
        os.path.join(src, "b1"),
        mtime_bump=60,
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    use_rocksdb_state_store(spark, bounded_memory_mb=256)
    try:
        assert spark.conf.get(key) == ROCKSDB_PROVIDER
        out = dedup_available_now(
            spark,
            src,
            DOCS_SCHEMA,
            ts_col="ts",
            delay="10 minutes",
            max_files_per_trigger=1,
        )
        rows = {r.text: r.doc_id for r in out.collect()}
        assert set(rows) == {"alpha", "beta", "gamma"}
        assert rows["alpha"] in (1, 2)  # cross-batch dup dropped
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
        spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage")
        spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB")
