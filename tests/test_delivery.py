"""Sink-delivery retry contract vs the reference engine semantics
(src/flb_engine.c FLB_OK/FLB_RETRY/FLB_ERROR branches,
src/flb_task.c:120-162 retry accounting, src/flb_scheduler.c:252-303
capped full-jitter backoff, src/flb_output.c:874-896 Retry_Limit)."""

from __future__ import annotations

import random

import pytest

from fluent_bit_spark.delivery import (
    FLB_ERROR,
    FLB_OK,
    FLB_RETRY,
    RETRY_NONE,
    RETRY_UNLIMITED,
    backoff_full_jitter,
    deliver,
    deliver_outputs,
    parse_retry_limit,
)


def _no_sleep(_s: float) -> None:
    pass


# ---------------------------------------------------- Retry_Limit parse


@pytest.mark.parametrize(
    "raw,expect",
    [
        (None, 1),
        ("no_limits", RETRY_UNLIMITED),
        ("false", RETRY_UNLIMITED),
        ("No_Limits", RETRY_UNLIMITED),
        ("no_retries", RETRY_NONE),
        ("7", 7),
        ("0", 1),  # invalid per reference: warn + default
        ("-3", 1),
        ("junk", 1),
        (4, 4),
        (-1, RETRY_UNLIMITED),
        (0, RETRY_NONE),
    ],
)
def test_parse_retry_limit(raw, expect):
    assert parse_retry_limit(raw) == expect


# ------------------------------------------------------------- backoff


def test_backoff_full_jitter_bounds():
    rng = random.Random(7)
    for n in range(1, 12):
        lo, hi = 5, min(2000, 5 * 2**n)
        for _ in range(50):
            v = backoff_full_jitter(5, 2000, n, rng)
            assert lo <= v <= hi
    # cap engaged: base * 2^n far above cap
    assert all(
        backoff_full_jitter(5, 2000, 30, rng) <= 2000 for _ in range(20)
    )


def test_backoff_deterministic_with_seed():
    a = [backoff_full_jitter(5, 2000, n, random.Random(42)) for n in range(1, 6)]
    b = [backoff_full_jitter(5, 2000, n, random.Random(42)) for n in range(1, 6)]
    assert a == b


# ------------------------------------------------------------- deliver


def test_ok_first_try():
    r = deliver(lambda: FLB_OK, sleep=_no_sleep)
    assert (r.ok, r.attempts, r.retries, r.dropped) == (True, 1, 0, 0)


def test_none_return_counts_as_ok():
    r = deliver(lambda: None, sleep=_no_sleep)
    assert r.ok and r.attempts == 1


def test_error_drops_without_retry():
    calls = []
    r = deliver(lambda: calls.append(1) or FLB_ERROR, sleep=_no_sleep)
    assert not r.ok and r.errors == 1 and r.dropped == 1
    assert r.retries == 0 and len(calls) == 1


def test_no_retries_drops_on_first_retry_signal():
    r = deliver(lambda: FLB_RETRY, retry_limit="no_retries", sleep=_no_sleep)
    assert not r.ok and r.dropped == 1 and r.retries == 0
    assert r.retries_failed == 0  # dropped for "no retry config", not limit


def test_default_limit_one_retry_then_failed():
    calls = []
    r = deliver(
        lambda: calls.append(1) or FLB_RETRY,
        rng=random.Random(1),
        sleep=_no_sleep,
    )
    # initial flush + exactly 1 retry (attempts >= limit gives up)
    assert len(calls) == 2 and r.attempts == 2 and r.retries == 1
    assert not r.ok and r.retries_failed == 1 and r.dropped == 1


def test_success_on_retry():
    seq = [FLB_RETRY, FLB_OK]
    r = deliver(
        lambda: seq.pop(0), retry_limit=3, rng=random.Random(1), sleep=_no_sleep
    )
    assert r.ok and r.attempts == 2 and r.retries == 1 and r.retries_failed == 0


def test_unlimited_retries_until_success():
    seq = [FLB_RETRY] * 9 + [FLB_OK]
    r = deliver(
        lambda: seq.pop(0),
        retry_limit="no_limits",
        rng=random.Random(3),
        sleep=_no_sleep,
    )
    assert r.ok and r.retries == 9


def test_exception_counts_as_retry():
    seq = [0, 1]

    def flaky() -> int:
        if seq.pop(0) == 0:
            raise OSError("503")
        return FLB_OK

    r = deliver(flaky, retry_limit=2, rng=random.Random(1), sleep=_no_sleep)
    assert r.ok and r.retries == 1


def test_wait_sequence_matches_reference_formula():
    slept: list[float] = []
    rng_used = random.Random(99)
    deliver(
        lambda: FLB_RETRY,
        retry_limit=4,
        rng=rng_used,
        sleep=slept.append,
    )
    rng_chk = random.Random(99)
    expect = [backoff_full_jitter(5, 2000, n, rng_chk) + 1 for n in range(1, 5)]
    assert slept == expect
    # every wait within the reference envelope: [base+1, cap+1]
    assert all(6 <= s <= 2001 for s in slept)


def test_deliver_outputs_isolated_per_sink():
    seq_b = [FLB_RETRY, FLB_OK]
    res = deliver_outputs(
        {
            "file.0": lambda: FLB_ERROR,
            "file.1": lambda: seq_b.pop(0),
        },
        retry_limits={"file.1": 2},
        rng=random.Random(5),
        sleep=_no_sleep,
    )
    assert not res["file.0"].ok and res["file.0"].errors == 1
    assert res["file.1"].ok and res["file.1"].retries == 1


# -------------------------------------------- classic conf integration


def test_classic_retry_limits_parse(spark):
    from fluent_bit_spark.classic import build_classic_pipeline

    conf = """
[INPUT]
    Name dummy
    Tag t1
    Samples 1
[OUTPUT]
    Name file
    Match t1
    Retry_Limit no_limits
[OUTPUT]
    Name null
    Match *
    Retry_Limit 3
[OUTPUT]
    Name stdout
    Match *
"""
    pipe = build_classic_pipeline(spark, conf)
    lims = pipe.retry_limits()
    assert lims["file.0"] == RETRY_UNLIMITED
    assert lims["null.1"] == 3
    assert lims["stdout.2"] == 1


def test_spark_write_flush_under_contract(spark, tmp_path):
    """A real sink write as the flush body: first attempt raises (the
    transient endpoint failure), the retry lands the parquet files."""
    df = spark.range(0, 100).selectExpr("id", "id % 3 AS k")
    state = {"fail": True}

    def flush() -> int:
        if state["fail"]:
            state["fail"] = False
            raise OSError("endpoint 503")
        df.write.mode("overwrite").parquet(str(tmp_path / "out"))
        return FLB_OK

    r = deliver(flush, retry_limit=2, rng=random.Random(1), sleep=_no_sleep)
    assert r.ok and r.retries == 1
    assert spark.read.parquet(str(tmp_path / "out")).count() == 100
