"""in_syslog: stream framing + per-message parse.

Reference: /root/reference/plugins/in_syslog/syslog_prot.c —
syslog_prot_process (:163-228) frames a TCP/unix-stream buffer on
``\\n`` OR ``\\0``, consumes empty frames silently, runs the configured
parser per frame, and DROPS unparseable frames with a warning (the
``flb_parser_do < 0`` branch, :205-210); a parsed time of 0 falls back
to the arrival time (:204). syslog_prot_process_udp (:230-262): one
datagram = one message, same parse/drop rule. pack_line (:69-161)
optionally expands the record with ``raw_message_key`` (the original
frame) and ``source_address_key`` (the peer address).

Parser default (syslog_conf.c:159-168): ``syslog-rfc5424`` for
tcp/udp, ``syslog-rfc3164-local`` for unix_tcp/unix_udp; an explicit
``Parser`` name wins.

Spark shape: the transport is out of scope (SURVEY §2.1) — the input
is a DataFrame of captured stream chunks or datagrams; framing is a
split+explode projection and the parse is the engine's vectorized
parser machinery (parsers/compile.apply_parser), so a replay of
captured syslog traffic runs at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _default_parser_name(mode: str) -> str:
    if mode in ("tcp", "udp"):
        return "syslog-rfc5424"
    if mode in ("unix_tcp", "unix_udp"):
        return "syslog-rfc3164-local"
    raise ValueError(f"unknown syslog mode {mode!r}")


def frame_syslog_stream(
    df: DataFrame, data_col: str = "data", line_col: str = "line"
) -> DataFrame:
    """TCP/unix-stream chunk -> one row per frame: split on \\n or \\0,
    empty frames consumed silently (syslog_prot_process :178-192).
    Incomplete-tail buffering across chunks is a transport concern;
    captured replays hold whole payloads per row."""
    frames = F.split(F.col(data_col), "[\n\u0000]")
    out = df.withColumn(line_col, F.explode(frames))
    return out.filter(F.length(line_col) > 0).drop(
        *([data_col] if data_col != line_col else [])
    )


def parse_syslog(
    df: DataFrame,
    line_col: str = "line",
    mode: str = "udp",
    parser: str | None = None,
    specs: dict | None = None,
    raw_message_key: str | None = None,
    source_address_key: str | None = None,
    source_address_col: str | None = None,
    default_time: Column | None = None,
) -> DataFrame:
    """One framed message per input row -> parsed record rows.

    Unparseable rows are dropped (the reference warns and skips);
    ``event_time`` is the parsed header time or ``default_time``
    (arrival time) when missing/zero.
    """
    from fluent_bit_spark.parsers.builtin import merge_builtin_parsers
    from fluent_bit_spark.parsers.compile import apply_parser

    if mode in ("tcp", "unix_tcp"):
        df = frame_syslog_stream(df, data_col=line_col, line_col=line_col)

    all_specs = merge_builtin_parsers(specs or {})
    name = parser or _default_parser_name(mode)
    if name not in all_specs:
        raise ValueError(f"[in_syslog] parser not set: {name!r}")

    if raw_message_key:
        df = df.withColumn(raw_message_key, F.col(line_col))
    if source_address_key:
        src = (F.col(source_address_col) if source_address_col
               else F.lit(None).cast("string"))
        df = df.withColumn(source_address_key, src)

    out = apply_parser(df, line_col, all_specs[name])
    out = out.filter(F.col("_parse_ok")).drop("_parse_ok", line_col)
    fallback = default_time if default_time is not None \
        else F.current_timestamp()
    if "event_time" in out.columns:
        out = out.withColumn(
            "event_time", F.coalesce(F.col("event_time"), fallback))
    else:
        out = out.withColumn("event_time", fallback)
    return out
