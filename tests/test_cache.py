"""Tracked-persist lifecycle: operators register persisted
intermediates; release_all() leaves the storage layer empty."""

from pyspark.sql import functions as F

from fluent_bit_spark import cache
from fluent_bit_spark.textprep.dedup import minhash_lsh_pairs


def _n_persistent(spark) -> int:
    return len(spark.sparkContext._jsc.getPersistentRDDs())


def test_release_all_after_minhash(spark):
    df = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 3} jumps over the lazy dog") for i in range(60)],
        ["doc_id", "text"],
    )
    out = minhash_lsh_pairs(df, threshold=0.5, est_margin=0.15)
    out.count()  # final action while intermediates are pinned
    assert _n_persistent(spark) > 0  # sigs (+ triage) really cached
    released = cache.release_all()
    assert released >= 1
    assert _n_persistent(spark) == 0
    assert cache.release_all() == 0  # idempotent


def test_pinned_scope(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "a b c")], ["doc_id", "text"])
    with cache.pinned():
        minhash_lsh_pairs(df, threshold=0.1).count()
    assert _n_persistent(spark) == 0
