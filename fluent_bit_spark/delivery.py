"""Sink delivery with the reference's flush/retry contract.

The reference's output flush callback returns FLB_OK / FLB_RETRY /
FLB_ERROR per event chunk (include/fluent-bit/flb_macros.h:29-31).
The engine reacts per src/flb_engine.c:300-420:

- FLB_OK     -> done; any pending retry context is cleaned.
- FLB_ERROR  -> chunk dropped immediately (errors + dropped counters),
                never retried.
- FLB_RETRY  -> if retry_limit is "no_retries" the chunk is dropped on
                the spot; otherwise a retry is created (attempts=1) or
                its attempts incremented (src/flb_task.c:120-162), and
                when attempts reach the limit the chunk is dropped and
                counted as retries_failed. The retry is scheduled after
                ``backoff_full_jitter(base, cap, attempts) + 1``
                seconds (src/flb_scheduler.c:252-303, defaults
                scheduler.base=5 / scheduler.cap=2000 from
                include/fluent-bit/flb_scheduler.h:29-30).
- retry_limit parsing mirrors src/flb_output.c:874-896: "no_limits" /
  "false" -> unlimited, "no_retries" -> none, integer <= 0 -> warn and
  fall back to the default of 1.

Spark mapping. Spark already retries *task* failures (executor death,
shuffle fetch) inside a job — that layer needs nothing from us. What
it does NOT retry is the driver-side delivery of a finished sink
DataFrame to a flaky endpoint (an object-store 503, an overloaded
catalog commit): one exception fails the job. This module wraps that
driver-side flush — each routed sink's write action is one "chunk
flush" in reference terms — with the same disposition codes, capped
full-jitter backoff, and drop/limit accounting, and reports the same
counters the reference's engine metrics expose (retries,
retries_failed, errors, dropped). At 100 TB the flush is one Spark
write action per sink per micro-batch; the backoff sleeps happen on
the driver between job submissions, never inside executors.

Determinism: the reference seeds libc rand from random bytes per call
(src/flb_scheduler.c:88-110). Tests need reproducible wait sequences,
so ``deliver`` takes an optional ``rng`` (``random.Random``) and an
injectable ``sleep``.
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass, field
from typing import Callable

# include/fluent-bit/flb_macros.h:29-31
FLB_ERROR = 0
FLB_OK = 1
FLB_RETRY = 2

# include/fluent-bit/flb_scheduler.h:29-30
SCHED_BASE = 5
SCHED_CAP = 2000

# include/fluent-bit/flb_output.h:316-318
RETRY_UNLIMITED = -1
RETRY_NONE = 0


def parse_retry_limit(value: str | int | None) -> int:
    """``Retry_Limit`` property -> limit int (src/flb_output.c:874-896)."""
    if value is None:
        return 1
    if isinstance(value, int):
        return value if value >= -1 else 1
    v = value.strip().lower()
    if v in ("no_limits", "false"):
        return RETRY_UNLIMITED
    if v == "no_retries":
        return RETRY_NONE
    try:
        n = int(v)
    except ValueError:
        return 1
    # the reference warns and resets to default on <= 0
    return n if n > 0 else 1


def backoff_full_jitter(
    base: int, cap: int, n: int, rng: random.Random
) -> int:
    """Capped full-jitter backoff (src/flb_scheduler.c:252-265):
    uniform over [base, min(cap, base * 2^n)] inclusive."""
    temp = min(cap, base * (2**n))
    return rng.randint(base, max(base, temp))


@dataclass
class DeliveryResult:
    """Per-flush accounting, mirroring the engine's output metrics
    (src/flb_engine.c: retries / retries_failed / errors / dropped)."""

    ok: bool
    attempts: int  # flush calls made (initial + retries)
    retries: int  # retries scheduled
    retries_failed: int  # 1 if the retry limit was exhausted
    errors: int  # 1 if the flush returned FLB_ERROR
    dropped: int  # 1 if the chunk was dropped (any reason)
    waits: list[int] = field(default_factory=list)  # seconds slept


def deliver(
    flush: Callable[[], int],
    retry_limit: int | str | None = 1,
    base: int = SCHED_BASE,
    cap: int = SCHED_CAP,
    rng: random.Random | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> DeliveryResult:
    """Run one chunk flush under the reference's retry contract.

    ``flush`` performs the delivery (e.g. ``df.write...save()`` for
    one sink) and returns FLB_OK / FLB_RETRY / FLB_ERROR (returning
    None counts as FLB_OK); a raised exception counts as FLB_RETRY (a
    C plugin signals transient failure with FLB_RETRY; in Python the
    transient failure IS the exception). Like the reference's engine,
    nothing is re-raised: an exhausted or errored chunk is dropped and
    the result records the drop and the counters.
    """
    limit = parse_retry_limit(retry_limit)
    rng = rng or random.Random()
    attempts = 0
    retries = 0
    waits: list[int] = []

    def _call() -> int:
        try:
            ret = flush()
        except Exception:
            return FLB_RETRY
        return FLB_OK if ret is None else ret

    while True:
        attempts += 1
        ret = _call()
        if ret == FLB_OK:
            return DeliveryResult(
                ok=True, attempts=attempts, retries=retries,
                retries_failed=0, errors=0, dropped=0, waits=waits,
            )
        if ret == FLB_ERROR:
            # src/flb_engine.c FLB_ERROR branch: errors + dropped, no retry
            return DeliveryResult(
                ok=False, attempts=attempts, retries=retries,
                retries_failed=0, errors=1, dropped=1, waits=waits,
            )
        # FLB_RETRY
        if limit == RETRY_NONE:
            # "chunk is not retried (no retry config)" -> dropped
            return DeliveryResult(
                ok=False, attempts=attempts, retries=retries,
                retries_failed=0, errors=0, dropped=1, waits=waits,
            )
        # src/flb_task.c:131: give up when attempts reach the limit
        if limit >= 0 and retries >= limit:
            return DeliveryResult(
                ok=False, attempts=attempts, retries=retries,
                retries_failed=1, errors=0, dropped=1, waits=waits,
            )
        retries += 1
        # src/flb_scheduler.c:296-303: jittered seconds, +1 floor
        secs = backoff_full_jitter(base, cap, retries, rng) + 1
        waits.append(secs)
        sleep(secs)


def deliver_outputs(
    outputs: dict[str, Callable[[], int]],
    retry_limits: dict[str, int | str] | None = None,
    base: int = SCHED_BASE,
    cap: int = SCHED_CAP,
    rng: random.Random | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> dict[str, DeliveryResult]:
    """Flush every sink independently (one failed sink never blocks the
    others — the reference fans each chunk out to all matching outputs
    and each keeps its own retry context)."""
    limits = retry_limits or {}
    return {
        oid: deliver(
            fl, retry_limit=limits.get(oid, 1),
            base=base, cap=cap, rng=rng, sleep=sleep,
        )
        for oid, fl in outputs.items()
    }
