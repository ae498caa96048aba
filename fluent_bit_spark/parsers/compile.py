"""Compile ParserSpecs into columnar Spark extraction plans.

The reference parses row-at-a-time msgpack (flb_parser_do,
/root/reference/src/flb_parser.c:1044-1065 dispatching to
flb_parser_regex.c / flb_parser_json.c / flb_parser_ltsv.c /
flb_parser_logfmt.c). Here each parser becomes a pure
DataFrame -> DataFrame function:

- regex:  builtin mode = one JVM `regexp_extract` per named group
          (whole-stage codegen, no Python); arrow mode = ONE
          Arrow-vectorized pandas UDF doing a single regex pass per row
          via pandas ``Series.str.extract`` (wins when group count is
          high). Mode 'auto' picks by group count.
- json:   `from_json` (PERMISSIVE) into a supplied schema or
          map<string,string>.
- ltsv:   pure Catalyst split/transform/map_from_entries with the
          reference's first-':' label split (flb_parser_ltsv.c:82-269).
- logfmt: Arrow-vectorized pandas UDF implementing the reference state
          machine (flb_parser_logfmt.c:63-326) — quoted values,
          backslash escapes, bare key => true.

Time fields follow flb_parser_time_lookup (see functions/timeparse.py);
Types casts follow flb_parser_typecast (src/flb_parser.c:1280-1350).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluent_bit_spark.parsers.config import DecoderRule, ParserSpec
from fluent_bit_spark.functions.timeparse import time_parse_col

# ---------------------------------------------------------------- regex


def capture_group_indexes(pattern: str) -> dict[str, int]:
    """Map named capture -> Java regex group number (1-based).

    Named groups count in the same numbering as unnamed capturing
    groups; (?:...), lookarounds and inline flags don't capture.
    """
    out: dict[str, int] = {}
    idx = 0
    i = 0
    n = len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            i += 1
            continue
        if c == "[":
            in_class = True
            i += 1
            continue
        if c == "(":
            m = re.match(r"\(\?<([A-Za-z_][A-Za-z0-9_]*)>", pattern[i:])
            if m:
                idx += 1
                out[m.group(1)] = idx
                i += m.end()
                continue
            if re.match(r"\(\?", pattern[i:]):
                # non-capturing / lookaround / flags
                i += 2
                continue
            idx += 1
        i += 1
    return out


def to_python_regex(pattern: str) -> str:
    """Onigmo/Java named groups -> Python (?P<name>...) syntax."""
    return re.sub(r"\(\?<([A-Za-z_][A-Za-z0-9_]*)>", r"(?P<\1>", pattern)


def _regex_builtin_cols(source: Column, spec: ParserSpec) -> dict[str, Column]:
    """One regexp_extract per named group; '' for an unmatched optional
    group is normalized to null (the reference omits skipped fields —
    flb_parser_regex.c:182-199 map-size patching)."""
    groups = capture_group_indexes(spec.regex or "")
    java_rx = to_java_regex(spec.regex or "")
    matched = source.rlike(java_rx)
    cols: dict[str, Column] = {}
    for name, gi in groups.items():
        raw = F.regexp_extract(source, java_rx, gi)
        cols[name] = F.when(matched & (raw != ""), raw)
    return cols


def _regex_arrow_col(source: Column, spec: ParserSpec) -> Column:
    """Single-pass Arrow-vectorized extraction returning a struct."""
    fields = spec.named_groups()
    py_pat = to_python_regex(spec.regex or "")
    ret = T.StructType([T.StructField(f, T.StringType()) for f in fields])

    @F.pandas_udf(ret)
    def extract(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        pat = re.compile(py_pat)
        for s in it:
            df = s.str.extract(pat)  # one regex pass, all groups
            # keep only named groups (unnamed capturing groups get
            # integer column labels); unmatched -> NaN -> null
            yield df[fields]

    return extract(source)


# ----------------------------------------------------------------- ltsv

_LTSV_EXPR = """
map_from_entries(
  transform(
    filter(split({src}, '\t'), x -> instr(x, ':') > 0),
    x -> struct(
      substring_index(x, ':', 1) AS key,
      substring(x, instr(x, ':') + 1) AS value
    )
  )
)
"""


def ltsv_map_col(source: Column | str) -> Column:
    """LTSV line -> map<string,string>, splitting each TAB-separated
    field at its first ':' (label charset check relaxed; the reference
    only admits [0-9A-Za-z_.-] labels, flb_parser_ltsv.c:44-59)."""
    name = source if isinstance(source, str) else None
    if name is None:
        raise ValueError("ltsv_map_col requires a column name")
    return F.expr(_LTSV_EXPR.format(src=name))


# --------------------------------------------------------------- logfmt

_LOGFMT_BARE = "\x01true"  # sentinel for bare-key => boolean true


def _logfmt_parse_one(line: str, no_bare_keys: bool) -> dict[str, str] | None:
    """Port of logfmt_parser (flb_parser_logfmt.c:63-326).

    Returns key->value; bare keys map to the _LOGFMT_BARE sentinel so a
    downstream cast can recover the boolean-true semantics.
    """
    if line is None:
        return None
    out: dict[str, str] = {}
    n = len(line)
    i = 0

    def is_ident(ch: str) -> bool:
        # any byte > ' ' excluding '=' and '"' (flb_parser_logfmt.c:45-62);
        # multi-byte UTF-8 chars are all ident bytes in the reference
        return ch > " " and ch not in ('"', "=")

    while i < n:
        while i < n and not is_ident(line[i]):
            i += 1
        if i >= n:
            break
        k0 = i
        while i < n and is_ident(line[i]):
            i += 1
        key = line[k0:i]
        value = None
        value_set = False
        value_str = False
        value_escape = False
        if i < n and line[i] == "=":
            value_set = True
            i += 1
            if i < n:
                if line[i] == '"':
                    i += 1
                    v0 = i
                    value_str = True
                    while i < n:
                        if line[i] == "\\":
                            value_escape = True
                            i += 2
                        elif line[i] == '"':
                            break
                        else:
                            i += 1
                    value = line[v0 : min(i, n)]
                    if i < n and line[i] == '"':
                        i += 1
                else:
                    v0 = i
                    while i < n and is_ident(line[i]):
                        i += 1
                    value = line[v0:i]
        if key:
            if no_bare_keys and not value and not value_set:
                return {}
            if not value:
                out[key] = "" if value_str else _LOGFMT_BARE
            else:
                out[key] = _c_unescape(value) if value_escape else value
    return out


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "a": "\a", "b": "\b", "f": "\f", "v": "\v"}


def _c_unescape(s: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            out.append(_ESCAPES.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def logfmt_map_col(source: Column, no_bare_keys: bool = False) -> Column:
    @F.pandas_udf(T.MapType(T.StringType(), T.StringType()))
    def parse(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.map(lambda x: _logfmt_parse_one(x, no_bare_keys))

    return parse(source)


# JVM fast path for logfmt. One regex tokenization pass + per-token
# string ops, all inside whole-stage codegen — ~10-50x the Python UDF
# above on the pipeline hot path (the UDF remains the reference-exact
# fallback, incl. control-char idents and no_bare_keys).
#
# Token grammar mirrors logfmt_parser (flb_parser_logfmt.c:63-326):
#   key   = run of ident chars (not whitespace/'"'/'=')
#   value = '=' then quoted-with-escapes or ident run; missing/empty
#           unquoted value => bare sentinel; k="" => empty string.
# Escapes (\n \t \r \a \b \f \v, \\, \other) are unescaped only when a
# backslash is present, exactly like the value_escape flag in the C.
_LOGFMT_TOKEN_RX = (
    '[^\\\\s"=]+(?:=(?:"(?:[^"\\\\\\\\]|\\\\\\\\.)*"?|[^\\\\s"=]*))?'
)

# chr(92)=backslash chr(2)=placeholder; sequential replaces reproduce
# the C left-to-right escape scan (\\ first, then named, then \other)
_UNESC = (
    "replace(regexp_replace("
    "replace(replace(replace(replace(replace(replace(replace("
    "replace({v}, chr(92)||chr(92), chr(2)), "
    "chr(92)||'n', chr(10)), chr(92)||'t', chr(9)), chr(92)||'r', chr(13)), "
    "chr(92)||'a', chr(7)), chr(92)||'b', chr(8)), chr(92)||'f', chr(12)), "
    "chr(92)||'v', chr(11)), "
    "chr(92)||chr(92)||'(.)', '$1'), chr(2), chr(92))"
)

_LOGFMT_FAST_EXPR = """
map_from_entries(
  transform(
    regexp_extract_all({src}, '{tok}', 0),
    t -> named_struct(
      'key',
      CASE WHEN instr(t, '=') > 0 THEN substring(t, 1, instr(t, '=') - 1)
           ELSE t END,
      'value',
      CASE
        WHEN instr(t, '=') = 0 THEN '{bare}'
        WHEN substring(t, instr(t, '=') + 1) = '' THEN '{bare}'
        WHEN substring(t, instr(t, '=') + 1, 1) = '"' THEN
          CASE WHEN instr({inner}, chr(92)) > 0
               THEN {inner_unesc} ELSE {inner} END
        ELSE substring(t, instr(t, '=') + 1)
      END)))
"""

# inner = quoted value body: strip leading quote and (if present) the
# trailing quote; an unterminated quote keeps the tail (C behavior)
_INNER = (
    "CASE WHEN length(substring(t, instr(t, '=') + 1)) > 1 "
    "AND substring(t, -1, 1) = '\"' "
    "THEN substring(t, instr(t, '=') + 2, "
    "length(t) - instr(t, '=') - 2) "
    "ELSE substring(t, instr(t, '=') + 2) END"
)


def logfmt_map_fast_col(source: Column | str) -> Column:
    """Pure-Catalyst logfmt parse (see _LOGFMT_TOKEN_RX notes).

    Requires spark.sql.mapKeyDedupPolicy=LAST_WIN (duplicate keys:
    last occurrence wins, matching the C parser's dict overwrite).
    """
    name = source if isinstance(source, str) else None
    if name is None:
        raise ValueError("logfmt_map_fast_col requires a column name")
    expr = _LOGFMT_FAST_EXPR.format(
        src=name,
        tok=_LOGFMT_TOKEN_RX,
        bare=_LOGFMT_BARE,
        inner=_INNER,
        inner_unesc=_UNESC.format(v=_INNER),
    )
    return F.expr(expr)


# ------------------------------------------------------------ typecasts


def typecast_col(col: Column, ftype: str) -> Column:
    """flb_parser_typecast semantics (src/flb_parser.c:1280-1350)."""
    if ftype == "integer":
        return col.try_cast("long")
    if ftype == "float":
        return col.try_cast("double")
    if ftype == "bool":
        low = F.lower(col)
        return F.when(low.startswith("t"), F.lit(True)).when(
            low.startswith("f"), F.lit(False)
        )
    if ftype == "hex":
        return F.conv(col, 16, 10).try_cast("long")
    return col.cast("string")


# ------------------------------------------------------------- decoders


def unescape_col(col: Column) -> Column:
    r"""Decode_Field escaped/escaped_utf8: left-to-right C-unescape.

    Implemented JVM-side with the sentinel trick: '\\\\' is parked on a
    control char first so later single-escape replacements can't touch
    the freed backslashes, then restored.
    """
    c = F.regexp_replace(col, r"\\\\", "\x00")
    for esc, rep in [("n", "\n"), ("t", "\t"), ("r", "\r"), ("f", "\f"), ("b", "\b")]:
        c = F.regexp_replace(c, r"\\" + esc, rep)
    c = F.regexp_replace(c, r"\\(.)", r"$1")
    return F.regexp_replace(c, "\x00", r"\\")


def apply_decoder(df: DataFrame, rule: DecoderRule) -> DataFrame:
    if rule.key not in df.columns:
        return df
    col = F.col(rule.key)
    if rule.decoder == "json":
        parsed = F.from_json(col.cast("string"), T.MapType(T.StringType(), T.StringType()))
        if rule.mode == "as":
            return df.withColumn(rule.key, parsed)
        # DEC_DEFAULT: extracted keys join the record alongside the original
        return df.withColumn(f"{rule.key}_decoded", parsed)
    if rule.decoder in ("escaped", "escaped_utf8"):
        return df.withColumn(rule.key, unescape_col(col.cast("string")))
    if rule.decoder == "mysql_quoted":
        c = F.regexp_replace(col.cast("string"), r"''", "'")
        c = F.regexp_replace(c, r'""', '"')
        return df.withColumn(rule.key, c)
    return df


# ------------------------------------------------------------ top level


def compile_parser(spec: ParserSpec, mode: str = "auto"):
    """Return fn(df, source_col) -> df with extracted/typed columns.

    Adds: one column per extracted field, ``event_time`` (when the spec
    has Time_Key/Time_Format), and ``_parse_ok`` boolean. The original
    source column is left in place (callers drop it). ``mode`` only
    affects regex parsing: 'builtin' | 'arrow' | 'auto' (arrow when >4
    groups — one regex pass beats N).
    """

    def apply_fn(df: DataFrame, source_col: str, ref_year: int | None = None) -> DataFrame:
        return apply_parser(df, source_col, spec, mode=mode, ref_year=ref_year)

    return apply_fn


def apply_parser(
    df: DataFrame,
    source_col: str,
    spec: ParserSpec,
    mode: str = "auto",
    ref_year: int | None = None,
    json_schema: T.StructType | None = None,
) -> DataFrame:
    src = F.col(source_col)

    if spec.format == "regex":
        groups = spec.named_groups()
        use_arrow = mode == "arrow" or (mode == "auto" and len(groups) > 4)
        if use_arrow:
            st = _regex_arrow_col(src, spec)
            df = df.withColumn("_extracted", st)
            for g in groups:
                df = df.withColumn(g, F.col(f"_extracted.{g}"))
            df = df.drop("_extracted")
            # str.extract yields NaN both for whole-line no-match and for
            # skipped optional groups, so _parse_ok needs the real test:
            df = df.withColumn("_parse_ok", F.coalesce(src.rlike(to_java_regex(spec.regex or "")), F.lit(False)))
        else:
            cols = _regex_builtin_cols(src, spec)
            for name, c in cols.items():
                df = df.withColumn(name, c)
            df = df.withColumn("_parse_ok", F.coalesce(src.rlike(to_java_regex(spec.regex or "")), F.lit(False)))
    elif spec.format == "json":
        schema = json_schema or T.MapType(T.StringType(), T.StringType())
        parsed = F.from_json(src, schema)
        df = df.withColumn("_json", parsed).withColumn("_parse_ok", parsed.isNotNull())
        if isinstance(schema, T.StructType):
            for f in schema.fieldNames():
                df = df.withColumn(f, F.col(f"_json.{f}"))
        else:
            df = df.withColumn("record_map", F.col("_json"))
        df = df.drop("_json")
    elif spec.format == "ltsv":
        df = df.withColumn("record_map", ltsv_map_col(source_col))
        df = df.withColumn("_parse_ok", F.size("record_map") > 0)
    elif spec.format == "logfmt":
        df = df.withColumn("record_map", logfmt_map_col(src))
        df = df.withColumn("_parse_ok", F.size("record_map") > 0)
    else:
        raise ValueError(f"unknown parser format {spec.format!r}")

    # Types casts (only for columns materialized as top-level fields)
    for k, t in spec.types.items():
        if k in df.columns:
            df = df.withColumn(k, typecast_col(F.col(k), t))

    # decoders
    for rule in spec.decoders:
        df = apply_decoder(df, rule)

    # time lookup
    if spec.time_key and spec.time_format:
        tk = spec.time_key
        time_src: Column | None = None
        if tk in df.columns:
            time_src = F.col(tk).cast("string")
        elif "record_map" in df.columns:
            time_src = F.element_at(F.col("record_map"), tk)
        if time_src is not None:
            df = df.withColumn(
                "event_time",
                time_parse_col(time_src, spec.time_format, ref_year=ref_year,
                               time_offset_sec=spec.time_offset),
            )
            if not spec.time_keep:
                if tk in df.columns:
                    df = df.drop(tk)
                elif "record_map" in df.columns:
                    df = df.withColumn(
                        "record_map",
                        F.map_filter("record_map", lambda k, _: k != F.lit(tk)),
                    )
    return df


def to_java_regex(pattern: str) -> str:
    """Onigmo pattern -> Java regex.

    Java named groups reject underscores ((?<request_length>...) is a
    PatternSyntaxException), so named groups become plain capturing
    groups — numbering is unchanged and builtin extraction is by group
    index. Lookbehinds ((?<=, (?<!) are left alone.
    """
    return re.sub(r"\(\?<([A-Za-z_][A-Za-z0-9_]*)>", "(", pattern)
