"""BPE trainer/apply: golden merges, parity with a naive reference,
determinism of the distributed word-count reduction."""

import pytest

from fluent_bit_spark.textprep.bpe import (
    END,
    bpe_apply,
    bpe_train,
    encode_word,
    word_counts,
)


@pytest.fixture(scope="module")
def spark():
    from fluent_bit_spark.session import get_spark

    return get_spark("test-bpe", master="local[4]")


def test_bpe_train_golden():
    # classic toy corpus (Sennrich et al. §3 shape): 'low' family
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train(wc, n_merges=4)
    # e+s dominates (9), then es+t (9), then est+</w> (9), then l+o (7)
    assert merges == [("e", "s"), ("es", "t"), ("est", END), ("l", "o")]


def test_bpe_train_tiebreak_deterministic():
    # equal counts -> lexicographic pair order decides
    wc = [("ab", 2), ("cd", 2)]
    merges = bpe_train(wc, n_merges=1)
    assert merges == [("a", "b")]


def test_encode_word_matches_training_segmentation():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    ranks5 = {p: i for i, p in enumerate(bpe_train(wc, n_merges=5))}
    assert encode_word("newest", ranks5) == ["n", "e", "w", "est</w>"]
    # enough merges -> the frequent word collapses to one token
    ranks = {p: i for i, p in enumerate(bpe_train(wc, n_merges=10))}
    assert encode_word("newest", ranks) == ["newest" + END]
    # unseen word falls back to finer pieces, never errors
    out = encode_word("lowest", ranks)
    assert "".join(out) == "lowest" + END


def test_word_counts_and_apply_end_to_end(spark):
    docs = spark.createDataFrame(
        [(1, "low low low low low lower lower"), (2, "newest newest widest")],
        "doc_id int, text string",
    )
    wc = word_counts(docs)
    rows = {r["word"]: r["cnt"] for r in wc.collect()}
    assert rows == {"low": 5, "lower": 2, "newest": 2, "widest": 1}

    merges = bpe_train(wc, n_merges=6)
    out = bpe_apply(docs, merges).orderBy("doc_id").collect()
    ranks = {p: i for i, p in enumerate(merges)}
    for r in out:
        expect = [t for w in r["text"].split() for t in encode_word(w, ranks)]
        assert r["bpe_tokens"] == expect
        assert r["n_bpe_tokens"] == len(expect)
    # round-trip: concatenation restores the original words
    joined = "".join(out[0]["bpe_tokens"]).replace(END, " ").strip()
    assert joined == out[0]["text"]


def test_word_counts_cap_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common") for i in range(50)], "doc_id int, text string"
    )
    top = word_counts(docs, top_k=3).collect()
    # 'common' (50) first, then the w* ties broken by word order
    assert [r["word"] for r in top] == ["common", "w0", "w1"]
