"""out_cloudwatch_logs: PutLogEvents event encoding + batching math.

Reference: /root/reference/plugins/out_cloudwatch_logs/cloudwatch_api.c
- add_event (:380-470): the event message is the record rendered to
  JSON and then JSON-STRING-ESCAPED (flb_utils_write_str) — or, with
  ``log_key`` set, that single value's escaped rendering (the code
  strips the surrounding quotes, :447-452); empty messages are
  discarded (:404) and the escaped message is truncated to
  MAX_EVENT_LEN = 262118 bytes (:344-352, truncate_log cuts bytes with
  no regard for escape-sequence boundaries — kept).
- write_event (:245-280): ``{"timestamp":<ms>,"message":"<escaped>"}``
  with ms = sec*1000 + nsec/1e6 (:464).
- compare_events (:174): events are sorted by timestamp ascending
  before writing, and a PutLogEvents payload holds at most
  MAX_EVENTS_PER_PUT = 10000 events within PUT_LOG_EVENTS_PAYLOAD_SIZE
  = 1048576 bytes counting 72 header + 4 footer + 42 + len per event.

The escape runs in Catalyst: ``to_json(array(<string>))`` renders
``["<escaped>"]`` with exactly the JSON string escaping the reference
applies, so the encoder stays whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_EVENT_LEN = 262118
MAX_EVENTS_PER_PUT = 10000
PAYLOAD_SIZE = 1048576
HEADER_LEN = 72
FOOTER_LEN = 4
PER_EVENT_LEN = 42


def _escaped(col: Column) -> Column:
    """JSON string escaping of a string column (no quotes)."""
    arr = F.to_json(F.array(col))  # ["<escaped>"]
    return F.substring(arr, 3, F.length(arr) - 4)


def to_cloudwatch_event(
    df: DataFrame,
    ts_col: str,
    tag_col: str = "tag",
    log_key: str | None = None,
) -> Column:
    """One PutLogEvents event JSON per record; NULL for records the
    reference discards (empty message / missing log_key)."""
    if log_key is not None:
        msg_src = F.col(log_key).cast("string")
    else:
        msg_src = F.to_json(
            F.struct(*[df[c] for c in df.columns
                       if c not in (ts_col, tag_col)
                       and not c.startswith("_")]),
            {"ignoreNullFields": "false"},
        )
    esc = _escaped(msg_src)
    esc = F.substring(esc, 1, MAX_EVENT_LEN)  # truncate_log, byte cut
    us = F.unix_micros(F.col(ts_col))
    ms = ((us - us % 1000) / 1000).cast("long")
    event = F.concat(
        F.lit('{"timestamp":'), ms.cast("string"),
        F.lit(',"message":"'), esc, F.lit('"}'),
    )
    # discard empty messages; with log_key, missing key drops the record
    return F.when(
        msg_src.isNotNull() & (F.length(msg_src) > 0), event)


def cloudwatch_payloads(
    events: list[tuple[int, str]],
    max_events: int = MAX_EVENTS_PER_PUT,
    max_payload: int = PAYLOAD_SIZE,
) -> list[str]:
    """(ts_ms, event_json) list -> PutLogEvents ``logEvents`` arrays,
    sorted by timestamp with the reference's count/size caps."""
    ordered = sorted(events, key=lambda e: e[0])
    out: list[str] = []
    batch: list[str] = []
    size = HEADER_LEN + FOOTER_LEN
    for _, ev in ordered:
        ev_bytes = len(ev) + PER_EVENT_LEN
        if batch and (len(batch) >= max_events
                      or size + ev_bytes > max_payload):
            out.append("[" + ",".join(batch) + "]")
            batch, size = [], HEADER_LEN + FOOTER_LEN
        batch.append(ev)
        size += ev_bytes
    if batch:
        out.append("[" + ",".join(batch) + "]")
    return out
