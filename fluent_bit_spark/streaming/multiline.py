"""Streaming stateful multiline join: the reference's ml engine shape.

fluent-bit's multiline core is a STATEFUL STREAMING operator: per
stream, a pending record buffers across chunk boundaries and a
flush_ms timer emits it if no continuation arrives
(src/multiline/flb_ml.c:48-76 flush interval, flb_ml_group state).
The batch form (operators/multiline.ml_rules_join) assumes the whole
stream is present; this module is the Structured Streaming form:

- state per stream key: the pending record's lines, DFA state, seq
  bounds, and a running record counter — exactly the reference's
  pending-buffer semantics (the record id keeps incrementing across
  micro-batches).
- applyInPandasWithState with a processing-time timeout as the
  flush_ms analog: if a key receives no lines before the timeout, the
  pending record flushes rather than waiting forever.

Scale: state per key is ONE pending record (bounded by max stack
depth), not history; keys partition across executors, so state store
size is (#live streams x pending record), the same bound the
reference's ml_group carries per stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from fluent_bit_spark.operators.multiline import BUILTIN_ML_RULES, MlRule


def _tables(rules: list[MlRule]):
    """(pattern list, start rules, continuation map) — same driver-side
    compilation as the batch form (flb_ml_rule.c registration order)."""
    pats = list(dict.fromkeys(r.pattern for r in rules))
    pat_idx = {p: i for i, p in enumerate(pats)}
    start = [(pat_idx[r.pattern], r.to_state) for r in rules if r.is_start]
    cont: dict[str, list[tuple[int, str]]] = {}
    for r in rules:
        if r.is_start:
            continue
        for s in r.from_states:
            cont.setdefault(s, []).append((pat_idx[r.pattern], r.to_state))
    return pats, start, cont


STATE_SCHEMA = StructType(
    [
        StructField("lines", ArrayType(StringType())),
        StructField("dfa_state", StringType()),
        StructField("first_seq", LongType()),
        StructField("next_record_id", LongType()),
    ]
)


def streaming_multiline(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    line_col: str,
    rules: list[MlRule] | str,
    flush_timeout_ms: int | None = 5000,
    sep: str = "\n",
) -> DataFrame:
    """Stateful streaming form of ml_rules_join.

    ``df`` is a streaming DataFrame of (key_cols..., order_col long,
    line_col string). Emits completed records as they close; a pending
    record flushes after ``flush_timeout_ms`` of key inactivity
    (flb_ml.c flush_ms).

    ``flush_timeout_ms=None`` disables the flush timer (NoTimeout):
    required for availableNow drains, where a pending processing-time
    timeout would keep the trigger alive spinning no-data batches —
    the pending record then simply persists in the state store until
    the next run's lines complete it (the in_tail restart analog).
    """
    if isinstance(rules, str):
        rules = BUILTIN_ML_RULES[rules]
    pats, start_rules, cont = _tables(rules)

    # same split as the batch form: the regex work runs JVM-side as a
    # per-line bitmask BEFORE the stateful shuffle; the Python state
    # function only walks ints
    from pyspark.sql import functions as F

    mask = None
    for i, p in enumerate(pats):
        bit = F.when(F.col(line_col).rlike(p), F.lit(1 << i)).otherwise(0)
        mask = bit if mask is None else (mask + bit)
    df = df.select(
        *key_cols, F.col(order_col), F.col(line_col), mask.alias("_flags")
    )

    key_fields = [f for f in df.schema.fields if f.name in key_cols]
    out_schema = StructType(
        key_fields
        + [
            StructField("record_id", LongType()),
            StructField("record", StringType()),
            StructField(f"first_{order_col}", LongType()),
            StructField("n_lines", LongType()),
        ]
    )

    def proc(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            lines, dfa_state, first_seq, next_id = state.get
            lines = list(lines)
        else:
            lines, dfa_state, first_seq, next_id = [], None, None, 0
        out: list[dict] = []
        keys = dict(zip(key_cols, key))

        def flush() -> None:
            nonlocal lines, first_seq, next_id, dfa_state
            if lines:
                out.append(
                    {
                        **keys,
                        "record_id": next_id,
                        "record": sep.join(lines),
                        f"first_{order_col}": first_seq,
                        "n_lines": len(lines),
                    }
                )
                next_id += 1
            lines, first_seq, dfa_state = [], None, None

        if state.hasTimedOut:
            # flush_ms fired with no new lines: emit the pending record
            flush()
            state.update((lines, dfa_state, first_seq, next_id))
            if flush_timeout_ms:
                state.setTimeoutDuration(flush_timeout_ms)
            yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])
            return

        rows: list[tuple[int, str, int]] = []
        for pdf in pdfs:
            rows.extend(zip(pdf[order_col], pdf[line_col], pdf["_flags"]))
        rows.sort(key=lambda t: t[0])
        for seq, line, fl in rows:
            line = line if line is not None else ""
            fl = int(fl)
            matched = False
            if dfa_state is not None:
                for bit, nxt in cont.get(dfa_state, ()):
                    if fl & (1 << bit):
                        lines.append(line)
                        dfa_state = nxt
                        matched = True
                        break
            if not matched:
                for bit, nxt in start_rules:
                    if fl & (1 << bit):
                        flush()
                        lines, first_seq, dfa_state = [line], int(seq), nxt
                        matched = True
                        break
            if not matched:
                flush()
                out.append(
                    {
                        **keys,
                        "record_id": next_id,
                        "record": line,
                        f"first_{order_col}": int(seq),
                        "n_lines": 1,
                    }
                )
                next_id += 1
                dfa_state = None
        state.update((lines, dfa_state, first_seq, next_id))
        if flush_timeout_ms:
            state.setTimeoutDuration(flush_timeout_ms)
        yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(
            proc,
            out_schema,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout
            if flush_timeout_ms
            else GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------------------ partial_message mode


PARTIAL_STATE_SCHEMA = StructType(
    [
        StructField("buf", StringType()),
        StructField("first_seq", LongType()),
    ]
)


def streaming_partial_message(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    content_col: str = "log",
    flush_timeout_ms: int | None = 5000,
) -> DataFrame:
    """Stateful streaming form of filter_multiline ``mode
    partial_message`` (plugins/filter_multiline/ml.c:600-733): the
    packer keyed by (stream key..., partial_id) accumulates content in
    arrival order across micro-batches; ``partial_last`` "true" emits
    the concatenation; a pending packer flushes after
    ``flush_timeout_ms`` of inactivity (ml.c partial_timer_cb — the
    reference flushes buffers older than flush_ms on a timer).
    Non-partial records must be routed around this operator (the
    reference's pass-through arm), keeping the state store strictly
    (#open split messages) entries.

    Input: (key_cols..., order_col long, content_col string,
    partial_id string, partial_last string). Output: key_cols... +
    partial_id + (content_col, first_<order_col>, complete).
    """
    from pyspark.sql import functions as F

    group_cols = [*key_cols, "partial_id"]
    df = df.select(
        *group_cols,
        F.col(order_col),
        F.col(content_col),
        F.coalesce(
            F.lower(F.col("partial_last").cast("string")).startswith("true"),
            F.lit(False),
        ).alias("_last"),
    )
    key_fields = [f for f in df.schema.fields if f.name in group_cols]
    out_schema = StructType(
        key_fields
        + [
            StructField(content_col, StringType()),
            StructField(f"first_{order_col}", LongType()),
            StructField("complete", StringType()),
        ]
    )
    cols = [f.name for f in out_schema.fields]

    def proc(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        keys = dict(zip(group_cols, key))
        if state.exists:
            buf, first_seq = state.get
        else:
            buf, first_seq = None, None
        out: list[dict] = []

        if state.hasTimedOut:
            if buf is not None:
                # partial_timer_cb: emit the pending (incomplete) buffer
                out.append(
                    {**keys, content_col: buf,
                     f"first_{order_col}": first_seq, "complete": "false"}
                )
            state.remove()
            yield pd.DataFrame(out, columns=cols)
            return

        rows: list[tuple[int, str, bool]] = []
        for pdf in pdfs:
            rows.extend(zip(pdf[order_col], pdf[content_col], pdf["_last"]))
        rows.sort(key=lambda t: t[0])
        for seq, content, last in rows:
            if buf is None:
                buf, first_seq = "", int(seq)
            buf += content if content is not None else ""
            if bool(last):
                out.append(
                    {**keys, content_col: buf,
                     f"first_{order_col}": first_seq, "complete": "true"}
                )
                buf, first_seq = None, None  # packer destroyed on emit
        if buf is None:
            state.remove()
        else:
            state.update((buf, first_seq))
            if flush_timeout_ms:
                state.setTimeoutDuration(flush_timeout_ms)
        yield pd.DataFrame(out, columns=cols)

    return df.groupBy(*group_cols).applyInPandasWithState(
        proc,
        out_schema,
        PARTIAL_STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if flush_timeout_ms
        else GroupStateTimeout.NoTimeout,
    )
