"""filter_parser: re-parse one field of the record with named parsers.

Reference: plugins/filter_parser/filter_parser.c:174-320 —
per record, the value under Key_Name runs through the configured
parsers IN ORDER until one succeeds; on success the parsed keys become
the record (plus the other original fields when Reserve_Data, plus the
original source key when Preserve_Key, and the parser's extracted time
replaces the record time); on failure the record passes untouched
(FLB_FILTER_NOTOUCH).

Columnar shape: each parser spec compiles to a (map, ok, ts)
expression triple over the source column; the first-success winner is
a single coalesce chain, all inside one codegen pass. Parsed keys
surface as top-level columns — static for regex specs (named groups),
sample-inferred for map-shaped formats (json/ltsv/logfmt), same
build-time inference pass spark.read.json runs (pass ``keys=`` at
scale to skip it).

Key-collision rule (documented): when a parsed key collides with a
surviving original column, the PARSED value wins on successful rows —
the reference writes parsed kvs first and its record accessor returns
the first occurrence (flb_ra_key.c scan order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.functions.timeparse import time_parse_col
from fluent_bit_spark.parsers.compile import (
    _regex_builtin_cols,
    logfmt_map_fast_col,
    ltsv_map_col,
    to_java_regex,
    typecast_col,
)
from fluent_bit_spark.parsers.config import ParserSpec

_SYSTEM_COLS = {"tag", "_parse_ok"}


def parse_map_expr(
    df: DataFrame, source_col: str, spec: ParserSpec
) -> tuple[Column, Column]:
    """(map<string,string>, ok) parse of one column under one spec."""
    src = F.col(source_col)
    if spec.format == "regex":
        cols = _regex_builtin_cols(src, spec)
        entries = F.array(
            *[
                F.struct(F.lit(name).alias("key"), c.alias("value"))
                for name, c in cols.items()
            ]
        )
        m = F.map_from_entries(
            F.filter(entries, lambda s: s.getField("value").isNotNull())
        )
        ok = F.coalesce(src.rlike(to_java_regex(spec.regex or "")), F.lit(False))
        return m, ok
    if spec.format == "json":
        m = F.from_json(src, "map<string,string>")
        return m, m.isNotNull()
    if spec.format == "ltsv":
        m = ltsv_map_col(src)
        return m, F.size(m) > 0
    if spec.format == "logfmt":
        m = logfmt_map_fast_col(source_col)
        return m, F.size(m) > 0
    raise ValueError(f"unknown parser format {spec.format!r}")


def _parsed_keys(
    df: DataFrame, winner: Column, specs: list[ParserSpec], sample_rows: int
) -> list[str]:
    """Output key set of the parser try-chain. Prefers static
    declarations (regex named groups; the ``Keys`` spec extension for
    map formats) — zero jobs at pipeline-construction time. Falls back
    to a bounded data sample ONLY for undeclared map parsers, with a
    warning: at scale an operator-construction-time scan per config
    line is a job per filter — declare keys instead."""
    static: list[str] = []
    dynamic = False
    for spec in specs:
        declared = spec.declared_keys()
        if declared is not None:
            static.extend(k for k in declared if k not in static)
        else:
            dynamic = True
    if not dynamic:
        return static
    import warnings

    warnings.warn(
        "filter_parser: inferring map-parser keys from a "
        f"{sample_rows}-row sample (construction-time Spark job); "
        "declare them with 'Keys k1 k2 ...' in the parser spec or "
        "pass keys= to skip this",
        stacklevel=3,
    )
    sampled = sorted(
        r[0]
        for r in df.limit(sample_rows)
        .select(F.explode(F.map_keys(F.coalesce(winner, F.expr("map()")))).alias("k"))
        .distinct()
        .collect()
    )
    return static + [k for k in sampled if k not in static]


def _effective_type(specs: list[ParserSpec], key: str) -> str:
    """Column type for a parsed key across the try-chain
    (flb_parser_typecast runs per winning parser, src/flb_parser.c:
    1280-1350; msgpack values are dynamically typed). Spark columns are
    statically typed, so the cast applies only when it is unambiguous:
    the unique declared type among specs that can produce the key —
    any disagreement (or an undeclared-keys map parser that could
    produce it untyped) degrades to string."""
    types: set[str] = set()
    for s in specs:
        declared = s.declared_keys()
        if declared is None or key in declared:
            types.add(s.types.get(key, "string"))
    return types.pop() if len(types) == 1 else "string"


def filter_parser(
    df: DataFrame,
    key_name: str,
    specs: list[ParserSpec],
    reserve_data: bool = False,
    preserve_key: bool = False,
    ts_col: str = "event_time",
    keys: list[str] | None = None,
    ref_year: int | None = None,
    gate: Column | None = None,
    sample_rows: int = 10_000,
) -> DataFrame:
    """Apply the filter_parser semantics above. ``gate`` scopes
    application row-wise (classic Match), composing with the
    parse-failed NOTOUCH path."""
    src_is_ra = key_name.strip().startswith("$")
    if src_is_ra:
        # record-accessor Key_Name ($log['data']): the value is READ
        # through the accessor, and the original nested key is always
        # preserved — the reference only removes plain top-level keys
        # (tests/runtime/filter_parser.c flb_test_..._record_accessor
        # asserts the nested log.data survives with Preserve_Key Off)
        from fluent_bit_spark.functions.accessor import ra_col_safe

        df = df.withColumn(
            "_fp_src", ra_col_safe(df, key_name).cast("string")
        )
        key_name = "_fp_src"
        preserve_key = True
    elif key_name not in df.columns:
        return df
    if not specs:
        raise ValueError("filter_parser needs at least one parser")

    pairs = [parse_map_expr(df, key_name, s) for s in specs]
    ok_any = F.lit(False)
    winner = F.lit(None).cast("map<string,string>")
    ts_new: Column = F.lit(None).cast("timestamp")
    for (m, ok), spec in zip(pairs, specs):
        first = ok & ~ok_any
        winner = F.when(first, m).otherwise(winner)
        if spec.time_key and spec.time_format:
            t = time_parse_col(
                m.getItem(spec.time_key), spec.time_format, ref_year=ref_year,
                time_offset_sec=spec.time_offset,
            )
            ts_new = F.when(first, t).otherwise(ts_new)
            if not spec.time_keep:
                winner = F.when(
                    first,
                    F.map_filter(m, lambda k, _v: k != spec.time_key),
                ).otherwise(winner)
        ok_any = ok_any | ok

    applied = ok_any if gate is None else (ok_any & gate)

    out_keys = keys or _parsed_keys(df, winner, specs, sample_rows)
    # materialize the parse ONCE before any column is rewritten — the
    # winner/ts expressions read the source column, which later steps
    # null out on applied rows
    out = (
        df.withColumn("_fp_map", winner)
        .withColumn("_fp_app", applied)
        .withColumn("_fp_ts", ts_new)
    )
    app = F.col("_fp_app")
    # originals: dropped on applied rows unless Reserve_Data
    if not reserve_data:
        for c in df.columns:
            if c in _SYSTEM_COLS or c == ts_col or c == key_name:
                continue
            out = out.withColumn(c, F.when(app, F.lit(None)).otherwise(F.col(c)))
    # the source key: kept only with Preserve_Key (or on untouched rows)
    if not preserve_key:
        out = out.withColumn(
            key_name, F.when(app, F.lit(None)).otherwise(F.col(key_name))
        )
    # parsed keys become columns; parsed value wins on applied rows.
    # Types casts apply to NEW keys only — a colliding original column
    # fixes the column type, and mixing a cast with NOTOUCH originals
    # in one statically-typed column is not expressible
    for k in out_keys:
        parsed = F.col("_fp_map").getItem(k)
        if k in out.columns:
            out = out.withColumn(k, F.when(app, parsed).otherwise(F.col(k)))
            continue
        ftype = _effective_type(specs, k)
        if ftype != "string":
            parsed = typecast_col(parsed, ftype)
        out = out.withColumn(k, F.when(app, parsed).otherwise(F.lit(None)))
    # parser-extracted time replaces the record time (out_time)
    if ts_col in out.columns:
        out = out.withColumn(
            ts_col,
            F.when(app & F.col("_fp_ts").isNotNull(), F.col("_fp_ts")).otherwise(
                F.col(ts_col)
            ),
        )
    drops = ["_fp_map", "_fp_app", "_fp_ts"]
    if src_is_ra:
        drops.append("_fp_src")
    return out.drop(*drops)
