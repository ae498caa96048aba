"""Local one-shot input plugins: in_head, in_random, in_exec.

References:
- in_head (/root/reference/plugins/in_head/in_head.c): read the first
  Buf_Size bytes (or Lines lines) of File per tick; record key is
  ``head`` (configurable Key), Add_Path adds ``path``; Lines mode with
  Split_Line emits one record per line (:173
  split_lines_per_record).
- in_random (/root/reference/plugins/in_random/random.c): one
  ``rand_value`` record per interval, Samples bounds the count (:59).
  The reference draws from /dev/urandom; here a seed makes runs
  reproducible (pass seed=None for entropy).
- in_exec (/root/reference/plugins/in_exec/in_exec.c): run Command
  per tick with popen, one record per stdout line under ``exec``, or
  through a parser when configured (:68-100). Commands run on the
  driver/edge node — exactly where the reference runs them; the
  DataFrame fans the parsed lines out for downstream stages.

Each returns a DataFrame in the classic pipeline's record shape so
[FILTER]/[OUTPUT] stages compose unchanged.
"""

from __future__ import annotations

import random as _random
import subprocess

from pyspark.sql import DataFrame, SparkSession


def head_records(
    spark: SparkSession,
    path: str,
    buf_size: int = 256,
    lines: int = 0,
    split_line: bool = False,
    key: str = "head",
    add_path: bool = False,
) -> DataFrame:
    """in_head's per-tick record(s)."""
    if lines > 0:
        with open(path, encoding="utf-8", errors="replace") as fh:
            got = [fh.readline().rstrip("\n") for _ in range(lines)]
        if split_line:
            rows = [{key: ln} for ln in got]
        else:
            rows = [{key: "\n".join(got) + "\n"}]
    else:
        with open(path, "rb") as fh:
            rows = [{key: fh.read(buf_size).decode("utf-8", "replace")}]
    if add_path:
        for r in rows:
            r["path"] = path
    return spark.createDataFrame(rows)


def random_records(
    spark: SparkSession, samples: int = 10, seed: int | None = 0
) -> DataFrame:
    """in_random's sample stream: ``rand_value`` uint64-shaped longs,
    bounded by ``samples`` like samples_count (random.c:59-63)."""
    rng = _random.Random(seed)
    rows = [
        {"rand_value": rng.getrandbits(63)} for _ in range(max(0, samples))
    ]
    return spark.createDataFrame(rows, "rand_value long")


def exec_records(
    spark: SparkSession,
    command: str,
    key: str = "exec",
    parser=None,
    timeout: float = 30.0,
) -> DataFrame:
    """in_exec's per-tick records: one row per stdout line; with a
    ParserSpec the lines go through apply_parser (the reference's
    flb_parser_do path)."""
    proc = subprocess.run(
        command, shell=True, capture_output=True, text=True, timeout=timeout
    )
    lines = proc.stdout.splitlines()
    df = spark.createDataFrame([(ln,) for ln in lines] or [("",)], [key])
    if not lines:
        df = df.limit(0)
    if parser is not None:
        from fluent_bit_spark.parsers import apply_parser

        return apply_parser(df, key, parser)
    return df
