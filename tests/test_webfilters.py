"""Web-corpus curation filters: hand-computed goldens for the
Gopher/C4-style signals, top-n-gram coverage, domain caps, PII scrub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.textprep.webfilters import (
    c4_clean_cols,
    domain_cap,
    gopher_quality_cols,
    line_repetition_cols,
    pii_scrub_cols,
    spark_chunk_lines,
    top_ngram_coverage,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_repetition_golden(spark):
    df = spark.createDataFrame(
        [(1, ["aa", "bb", "aa", "cc"]), (2, ["x", "y"])],
        "doc_id long, lines array<string>",
    )
    out = {
        r.doc_id: r
        for r in line_repetition_cols(df, "lines").collect()
    }
    # doc 1: 4 lines, 3 distinct -> dup_line_frac = 1 - 3/4 = 0.25;
    # duplicated content 'aa' covers 2 lines * 2 chars of 8 total
    assert out[1].n_lines == 4
    assert out[1].dup_line_frac == pytest.approx(0.25)
    assert out[1].dup_line_char_frac == pytest.approx(0.5)
    assert out[2].dup_line_frac == 0.0
    assert out[2].dup_line_char_frac == 0.0


def test_chunk_lines_expr(spark):
    df = _docs(spark, [(1, "a b c d e f g h i j")])
    lines = df.select(
        F.expr(spark_chunk_lines("text", wpl=4)).alias("l")
    ).first().l
    assert lines == ["a b c d", "e f g h", "i j"]


def test_gopher_gate_golden(spark):
    good = " ".join(["word"] * 60)  # 60 words, mean len 4, all alpha
    short = "tiny doc"  # word count below the floor
    symbolic = " ".join(["word"] * 30 + ["###"] * 30)  # symbol ratio 0.5
    out = {
        r.doc_id: r
        for r in gopher_quality_cols(
            _docs(spark, [(1, good), (2, short), (3, symbolic)])
        ).collect()
    }
    assert out[1].gopher_pass is True
    assert out[1].n_words == 60 and out[1].mean_word_len == 4.0
    assert out[2].gopher_pass is False
    assert out[3].gopher_pass is False
    assert out[3].symbol_word_ratio == pytest.approx(0.5)


def test_top_bigram_and_tiebreak(spark):
    # 'b c' occurs twice; 'a b' and 'c a'... construct: a b c b c
    # bigrams: 'a b','b c','c b','b c' -> top 'b c' x2
    df = _docs(spark, [(1, "a b c b c"), (2, "x y")])
    out = {r.doc_id: r for r in top_ngram_coverage(df).collect()}
    assert out[1].top_gram == "b c" and out[1].top_gram_count == 2
    # coverage: 2 occurrences * 3 chars / 9 chars
    assert out[1].top_gram_char_frac == pytest.approx(round(6 / 9, 6))
    # single bigram doc
    assert out[2].top_gram == "x y" and out[2].top_gram_count == 1
    # tie: 'p q' and 'q p' both once -> lexicographically smallest wins
    df2 = _docs(spark, [(3, "p q p")])
    r3 = top_ngram_coverage(df2).first()
    assert r3.top_gram == "p q"


def test_domain_cap(spark):
    rows = [(i, f"d{i % 2}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_cap(df, max_per_domain=3).collect()
    assert len(out) == 6
    kept = sorted(r.doc_id for r in out)
    assert kept == [0, 1, 2, 3, 4, 5]  # lowest ids per domain
    assert all(r.domain_rank <= 3 for r in out)


def test_pii_scrub_golden(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at jo.doe+x@site.org or call +1 (415) 555-0134"),
            (2, "server 192.168.0.1 and 10.0.0.7 up"),
            (3, "clean text only"),
        ],
    )
    out = {r.doc_id: r for r in pii_scrub_cols(df).collect()}
    assert out[1].n_email == 1 and out[1].n_phone == 1 and out[1].n_ip == 0
    assert "<EMAIL>" in out[1].scrubbed and "<PHONE>" in out[1].scrubbed
    assert "jo.doe" not in out[1].scrubbed and "555" not in out[1].scrubbed
    assert out[2].n_ip == 2
    assert out[2].scrubbed == "server <IP> and <IP> up"
    assert out[3].scrubbed == "clean text only"


def test_c4_clean_golden(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                [
                    "this line ends properly.",
                    "so does this one!",
                    "and a third one?",
                    "no punctuation here",
                    "short.",
                ],
            ),
            (2, ["only one good line.", "and javascript cookies here."]),
            (3, ["lorem ipsum dolor sit amet.", "keeps lines otherwise.",
                 "three words here.", "four good words here."]),
        ],
        "doc_id long, lines array<string>",
    )
    out = {r.doc_id: r for r in c4_clean_cols(df).collect()}
    # doc 1: 3 lines survive (>=3 words + terminal punct) -> keep
    assert out[1].n_kept_lines == 3 and out[1].c4_keep is True
    assert out[1].clean_text.count("\n") == 2
    # doc 2: javascript line dropped, only 1 kept -> below floor
    assert out[2].n_kept_lines == 1 and out[2].c4_keep is False
    # doc 3: enough kept lines but 'lorem ipsum' bans the whole doc
    assert out[3].n_kept_lines >= 3 and out[3].c4_keep is False


def test_benchmark_decontam(spark):
    from fluent_bit_spark.textprep.webfilters import benchmark_ngram_overlap

    docs = _docs(
        spark,
        [
            (1, "a b c d e f g h i j"),          # contains the bench 8-gram
            (2, "z y x w v u t s r q"),          # clean
            (3, "x a b c d e f g h tail words"), # bench gram shifted inside
        ],
    )
    bench = spark.createDataFrame([("a b c d e f g h",)], "text string")
    out = {r.doc_id: r.n_hits for r in benchmark_ngram_overlap(docs, bench, n=8).collect()}
    assert out == {1: 1, 3: 1}  # doc 2 clean -> absent


def test_benchmark_decontam_bloom_matches_exact(spark):
    from fluent_bit_spark.textprep.webfilters import (
        benchmark_ngram_overlap,
        benchmark_ngram_overlap_bloom,
    )

    docs = _docs(
        spark,
        [
            (1, "a b c d e f g h i j"),
            (2, "z y x w v u t s r q"),
            (3, "x a b c d e f g h tail words"),
        ],
    )
    bench = spark.createDataFrame([("a b c d e f g h",)], "text string")
    exact = {
        r.doc_id: r.n_hits
        for r in benchmark_ngram_overlap(docs, bench, n=8).collect()
    }
    bloom = {
        r.doc_id: r.n_hits
        for r in benchmark_ngram_overlap_bloom(docs, bench, n=8).collect()
    }
    assert bloom == exact == {1: 1, 3: 1}
    # a deliberately tiny/saturated bitset still yields the exact
    # result (every gram becomes a Bloom candidate; confirm join holds)
    saturated = {
        r.doc_id: r.n_hits
        for r in benchmark_ngram_overlap_bloom(
            docs, bench, n=8, n_bits=64, n_hashes=2
        ).collect()
    }
    assert saturated == exact


def test_chunk_documents_windows_and_overlap(spark):
    from fluent_bit_spark.textprep.webfilters import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, ""), (3, "x y")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 7 tokens, windows start 1,4,7 (step 3)
    c = by_doc[1]
    assert [(r["chunk_id"], r["start_token"], r["chunk_text"]) for r in c] == [
        (0, 1, "a b c d"),
        (1, 4, "d e f g"),
        (2, 7, "g"),
    ]
    assert [r["chunk_len"] for r in c] == [4, 4, 1]
    assert 2 not in by_doc  # empty doc -> no chunks
    assert by_doc[3][0]["chunk_text"] == "x y"
    # invalid overlap rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_corpus_shuffle_deterministic_and_sharded(spark):
    from fluent_bit_spark.textprep.webfilters import corpus_shuffle

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    a = corpus_shuffle(docs, n_shards=4, salt="ep0:").collect()
    b = corpus_shuffle(docs, n_shards=4, salt="ep0:").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    # shard positions are 1..len(shard) dense, ordered by shuffle_key
    by_shard: dict[int, list] = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["shard_pos"])
        assert [r["shard_pos"] for r in rows] == list(range(1, len(rows) + 1))
        keys = [r["shuffle_key"] for r in rows]
        assert keys == sorted(keys)
    # a different salt produces a different order
    c = corpus_shuffle(docs, n_shards=4, salt="ep1:").collect()
    key_a = {r["doc_id"]: r["shuffle_key"] for r in a}
    key_c = {r["doc_id"]: r["shuffle_key"] for r in c}
    assert key_a != key_c


def test_dedup_lines_golden(spark):
    from fluent_bit_spark.textprep.webfilters import dedup_lines_cols

    df = spark.createDataFrame(
        [(1, ["a", "b", "a", "c", "b", "a"]), (2, ["x"])],
        "doc_id long, lines array<string>",
    )
    out = {r.doc_id: r for r in dedup_lines_cols(df).collect()}
    assert out[1].n_lines_in == 6 and out[1].n_lines_out == 3
    assert out[1].clean_text == "a\nb\nc"  # first occurrences, in order
    assert out[2].clean_text == "x"


def test_stratified_sample_deterministic(spark):
    from fluent_bit_spark.textprep.webfilters import stratified_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], "doc_id long, source string"
    )
    a = {(r.doc_id, r.sample_rank) for r in stratified_sample(df, ["source"], 4).collect()}
    b = {(r.doc_id, r.sample_rank) for r in
         stratified_sample(df.repartition(7), ["source"], 4).collect()}
    assert a == b  # partitioning never changes the sample
    assert len(a) == 12  # 4 per stratum x 3 strata


def test_token_budget_pack(spark):
    from fluent_bit_spark.textprep.webfilters import token_budget_pack

    df = spark.createDataFrame(
        [(i, "en", 10) for i in range(10)] + [(100, "de", 25), (101, "de", 30)],
        "doc_id long, lang string, ws_tokens int",
    )
    out = token_budget_pack(df, budget=35, key_cols=["lang"]).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    # en: 10 tokens each -> exactly 3 fit within 35
    assert len(by_lang["en"]) == 3
    assert max(r.cum_tokens for r in by_lang["en"]) == 30
    # de: hash order decides which of 25/30 goes first; either way
    # only the first fits (25 or 30 <= 35, adding the second exceeds)
    assert len(by_lang["de"]) == 1


def test_sequence_pack_assignment(spark):
    from fluent_bit_spark.textprep.webfilters import sequence_pack

    df = spark.createDataFrame(
        [(i, "en", 60) for i in range(10)],
        "doc_id long, lang string, ws_tokens long",
    )
    out = sequence_pack(df, seq_len=100, key_cols=["lang"]).collect()
    assert len(out) == 10
    # 10 docs x 60 tokens into 100-token sequences: starts at 0,60,...
    by_cum = sorted(out, key=lambda r: r["cum_tokens"])
    assert [r["seq_id"] for r in by_cum] == [0, 0, 1, 1, 2, 3, 3, 4, 4, 5]
    assert by_cum[0]["seq_offset"] == 0 and by_cum[1]["seq_offset"] == 60
    # the doc starting at 60 ends at 120 -> straddles the 100 boundary
    assert by_cum[1]["straddles"] and not by_cum[0]["straddles"]
    # every doc's tokens are accounted for exactly once
    assert by_cum[-1]["cum_tokens"] == 600


def test_corpus_split_is_domain_keyed(spark):
    from fluent_bit_spark.textprep.webfilters import corpus_split_cols

    df = spark.createDataFrame(
        [(i, f"dom{i % 7}", "en") for i in range(70)],
        "doc_id long, source string, lang string",
    )
    out = corpus_split_cols(df).collect()
    splits_per_domain = {}
    for r in out:
        splits_per_domain.setdefault(r["source"], set()).add(r["split"])
    # all docs of a domain land in the same split, always
    assert all(len(s) == 1 for s in splits_per_domain.values())
    assert {r["split"] for r in out} <= {"train", "val", "test"}
