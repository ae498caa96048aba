"""Streaming corpus pipeline: batch parity of the windowed
per-domain/language card, with duplicates injected across
micro-batches and finalization via watermark advancement."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import Window

from fluent_bit_spark.datagen import generate_pages
from fluent_bit_spark.streaming.corpus import (
    corpus_card_available_now,
    corpus_gates,
)


def _write(df, path, bump):
    df.coalesce(1).write.mode("overwrite").parquet(path)
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            p = os.path.join(path, f)
            st = os.stat(p)
            os.utime(p, (st.st_atime + bump, st.st_mtime + bump))


def test_corpus_checkpoint_resume_preserves_dedup_state(spark, tmp_path):
    """Kill/restart between micro-batches: the restarted run must not
    re-read processed files, and duplicates arriving after the
    restart must still be dropped by the dedup state written BEFORE
    the restart."""
    from fluent_bit_spark.streaming.corpus import corpus_card_start
    from fluent_bit_spark.streaming.job import run_stream_to_completion

    src = str(tmp_path / "pages")
    out = str(tmp_path / "card")
    ckpt = str(tmp_path / "ckpt")
    pages = generate_pages(spark, 200, partitions=2)
    w = Window.partitionBy(F.md5("text")).orderBy("url")
    originals = (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .select("url", "warc_ts", "html", "text", "lang")
    )
    _write(originals, os.path.join(src, "b0"), 0)

    # run 1 drains b0, then the "job" dies
    q = corpus_card_start(spark, src, out, ckpt)
    run_stream_to_completion(q)

    # while down: duplicates (30 min later, new urls) + an advancer
    dups = (
        originals.filter(F.crc32("url") % 3 == 0)
        .withColumn("url", F.concat("url", F.lit("?dup")))
        .withColumn(
            "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 30 MINUTES")
        )
    )
    _write(dups, os.path.join(src, "b1"), 60)
    adv = originals.limit(1).select(
        F.lit("https://adv.example/x").alias("url"),
        (F.col("warc_ts") + F.expr("INTERVAL 48 HOURS")).alias("warc_ts"),
        "html",
        F.lit("advancer").alias("text"),
        "lang",
    )
    _write(adv, os.path.join(src, "b2"), 120)

    # run 2 resumes from the checkpoint
    q = corpus_card_start(spark, src, out, ckpt)
    run_stream_to_completion(q)
    # resumed run read only the new files' rows, not b0 again
    n_new = dups.count() + 1
    read_rows = sum(p["numInputRows"] for p in q.recentProgress)
    assert read_rows == n_new

    got = spark.read.parquet(out)
    expected = (
        corpus_gates(originals.select("url", "warc_ts", "text"))
        .groupBy(
            F.window("warc_ts", "1 hour").alias("w"), "domain", "pred_lang"
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select("domain", "pred_lang", "n_docs")
    )
    g = {(r.domain, r.pred_lang): r.n_docs for r in got.collect()}
    e = {(r.domain, r.pred_lang): r.n_docs for r in expected.collect()}
    # aggregate across windows per (domain, lang) for the compare
    agg_g: dict = {}
    for (d, l), n in g.items():
        agg_g[(d, l)] = agg_g.get((d, l), 0) + n
    agg_e: dict = {}
    for (d, l), n in e.items():
        agg_e[(d, l)] = agg_e.get((d, l), 0) + n
    # every duplicate was dropped by state restored from run 1
    assert agg_g == agg_e


def test_streaming_card_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages")
    pages = generate_pages(spark, 400, partitions=4)
    # originals: digest-unique (keep lexicographically-first url per
    # text) so the batch card is deterministic
    w = Window.partitionBy(F.md5("text")).orderBy("url")
    originals = (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    originals = originals.select("url", "warc_ts", "html", "text", "lang")
    _write(originals, os.path.join(src, "b0"), 0)

    # duplicates: re-sent 30 min later under new urls — must be
    # dropped by the cross-batch dedup state, not the watermark
    dups = (
        originals.filter(F.crc32("url") % 4 == 0)
        .withColumn("url", F.concat("url", F.lit("?dup")))
        .withColumn(
            "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 30 MINUTES")
        )
    )
    _write(dups, os.path.join(src, "b1"), 60)

    # advancer: far-future page whose watermark finalizes every real
    # window; its own window stays open and is withheld
    adv = originals.orderBy(F.col("warc_ts").desc()).limit(1).select(
        F.lit("https://adv.example/x").alias("url"),
        (F.col("warc_ts") + F.expr("INTERVAL 48 HOURS")).alias("warc_ts"),
        "html",
        "text",
        "lang",
    )
    _write(adv, os.path.join(src, "b2"), 120)

    got = corpus_card_available_now(
        spark, src, max_files_per_trigger=1
    ).collect()

    expected = (
        corpus_gates(originals.select("url", "warc_ts", "text"))
        .groupBy(
            F.window("warc_ts", "1 hour").alias("w"), "domain", "pred_lang"
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
        .collect()
    )

    key = lambda r: (r.window_start, r.domain, r.pred_lang)  # noqa: E731
    got_map = {key(r): r for r in got}
    exp_map = {key(r): r for r in expected}
    assert set(got_map) == set(exp_map)
    for k, e in exp_map.items():
        g = got_map[k]
        assert (
            g.n_docs,
            g.total_ws_tokens,
            g.total_chars,
            g.total_alpha_chars,
        ) == (e.n_docs, e.total_ws_tokens, e.total_chars, e.total_alpha_chars), k
