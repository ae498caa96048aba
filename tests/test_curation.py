"""Chained curation pipeline: per-stage gating + the spark-submit job.

Fixture design: docs share a 12-word vocabulary in different orders
(so the unigram LM sees common words -> low rare_frac, while no 8-gram
repeats across permutations), boilerplate docs are identical triples
(span-gated), and one doc duplicates another exactly (dedup-gated when
its n-grams stay under the span threshold)."""

from __future__ import annotations

import json

from fluent_bit_spark.textprep.curation import curate

P1 = "data spark table row column value query window batch stream filter join"
P2 = "join filter stream batch window query value column row table spark data"
P3 = "spark data row table value column window query stream batch join filter"
P4 = "table row data spark query window column value filter join batch stream"
BOILER = "all rights reserved contact the site administrator for licensing terms today"


def _pages(spark):
    rows = [
        (1, "https://good.org/en/a", P1, "en"),
        (2, "https://good.org/en/b", P2, "en"),
        (3, "https://blocked.com/en/c", P3, "en"),  # blocklist gate
        (4, "https://good.org/en/casino-zone", P4, "en"),  # path gate
        (5, "https://good.org/en/d", BOILER, "en"),  # span gate (x3)
        (6, "https://good.org/en/e", BOILER, "en"),
        (8, "https://good.org/en/g", BOILER, "en"),
        (7, "https://good.org/en/f", P1, "en"),  # exact dup of 1
    ]
    return spark.createDataFrame(
        rows, "doc_id long, url string, text string, lang string"
    )


def test_curate_stage_gates(spark):
    bl = spark.createDataFrame([("blocked.com",)], ["reg_domain"])
    # span_min_count=3: the boiler triple trips the span gate, the
    # 1/7 exact pair passes it and is resolved by the dedup stage
    res = curate(_pages(spark), bl, span_min_count=3)
    kept = {r["doc_id"] for r in res.kept.collect()}
    assert kept == {1, 2}
    card = res.card.collect()
    assert len(card) == 1
    row = card[0]
    assert row["reg_domain"] == "good.org" and row["n_docs"] == 2
    assert row["total_tokens"] == 24


def test_curate_default_span_gate_catches_exact_pairs(spark):
    # with the default min_count=2, an exact pair IS corpus-wide
    # boilerplate: both copies are fully covered and span-gated
    bl = spark.createDataFrame([("blocked.com",)], ["reg_domain"])
    # the surviving corpus is a single doc, so every token is a hapax:
    # lift the rare-fraction gate to isolate the span-gate behavior
    res = curate(_pages(spark), bl, max_rare_frac=1.0)
    kept = {r["doc_id"] for r in res.kept.collect()}
    assert kept == {2}


def test_run_curation_job(spark, tmp_path, monkeypatch, capsys):
    import jobs.run_curation as job

    inp = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    bld = str(tmp_path / "bl")
    _pages(spark).write.parquet(inp)
    spark.createDataFrame([("blocked.com",)], ["reg_domain"]).write.parquet(bld)
    monkeypatch.setattr(
        "sys.argv",
        ["run_curation.py", "--input", inp, "--output", out,
         "--blocklist", bld, "--max-rare-frac", "1.0"],
    )
    # main() imports get_spark from the session module at call time
    monkeypatch.setattr(
        "fluent_bit_spark.session.get_spark", lambda *a, **k: spark
    )
    monkeypatch.setattr(spark, "stop", lambda: None)
    job.main()
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["docs_in"] == 8 and metrics["docs_kept"] == 1
    kept = spark.read.parquet(out + "/kept")
    assert {r["doc_id"] for r in kept.collect()} == {2}
