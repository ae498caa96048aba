"""Tracked persist for operator intermediates.

Operators like minhash_lsh_pairs persist a signature table that the
returned (lazy) DataFrame still references — they cannot unpersist
before the caller's action runs. ``track()`` registers the persisted
DataFrame; the caller releases everything with ``release_all()`` after
its final action (or wraps the whole query in ``pinned()``). A
long-running job releases per query/batch so the storage layer never
accumulates stale cached blocks.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_LIVE: list = []


def track(df: DataFrame) -> DataFrame:
    """persist() + register for a later release_all()."""
    df.persist()
    _LIVE.append(df)
    return df


def track_releaser(fn) -> None:
    """Register an arbitrary zero-arg release callback — for storage
    that isn't a cached DataFrame (e.g. localCheckpoint RDDs held by
    iterative operators)."""
    _LIVE.append(fn)


def _release(item) -> None:
    if callable(item):
        item()
    else:
        item.unpersist(blocking=False)


def release_all() -> int:
    """Release every tracked intermediate (non-blocking). Returns
    the number released. Safe to call when nothing is tracked."""
    n = len(_LIVE)
    while _LIVE:
        _release(_LIVE.pop())
    return n


@contextmanager
def pinned():
    """Scope form: intermediates tracked inside the block are released
    on exit (run your action inside the block)."""
    mark = len(_LIVE)
    try:
        yield
    finally:
        while len(_LIVE) > mark:
            _release(_LIVE.pop())
