"""strptime-format time parsing compiled to Catalyst expressions.

Reference: ``flb_parser_time_lookup`` (/root/reference/src/flb_parser.c:1159-1278)
with three load-bearing behaviors:

1. ``%L`` fractional seconds: variable-width digit run (1..9 digits),
   truncated to what fits (parse_subseconds, flb_parser.c:1129-1156).
   Spark's datetime patterns want a fixed fraction width, so we split
   the string: parse the non-fractional part with ``to_timestamp`` and
   add the fraction as microseconds via ``timestampadd``.
2. Missing year (``%b %d %H:%M:%S`` syslog): the current UTC year is
   injected (flb_parser.c:1185-1218). ``ref_year`` pins it for tests.
3. ``%z`` offsets: accepts ``-0700``, ``+07:00`` and ``Z``. We
   normalize ``±HH:MM`` -> ``±HHMM`` then use Java pattern ``XX``
   (which also accepts ``Z``).

Everything is built-in Spark functions — zero Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# strptime directive -> Java DateTimeFormatter pattern piece
_STRPTIME_MAP = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%e": "d",
    "%b": "MMM",
    "%B": "MMMM",
    "%a": "EEE",
    "%A": "EEEE",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%p": "a",
    "%j": "DDD",
    "%z": "XX",
    "%Z": "zzz",
    "%%": "%",
    "%s": None,  # epoch seconds — handled specially
    "%L": None,  # fractional seconds — handled specially
}

_JAVA_QUOTE_NEEDED = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ'")


def has_year(fmt: str) -> bool:
    return "%Y" in fmt or "%y" in fmt or "%s" in fmt


def has_tz(fmt: str) -> bool:
    return "%z" in fmt or "%Z" in fmt


def strptime_to_java(fmt: str) -> tuple[str, str | None]:
    """Convert a strptime format to (java_prefix, java_suffix_or_None).

    The split happens at ``%L``; suffix is None when no ``%L``. Literal
    alphabetic characters get single-quoted for Java patterns.
    """
    parts: list[str] = [""]
    i = 0
    n = len(fmt)
    frac_seen = False
    while i < n:
        if fmt[i] == "%" and i + 1 < n:
            d = fmt[i : i + 2]
            if d == "%L":
                if frac_seen:
                    raise ValueError("multiple %L in time format")
                frac_seen = True
                parts.append("")
                i += 2
                continue
            mapped = _STRPTIME_MAP.get(d)
            if mapped is None:
                raise ValueError(f"unsupported strptime directive {d!r} in {fmt!r}")
            parts[-1] += mapped
            i += 2
        else:
            c = fmt[i]
            if c in _JAVA_QUOTE_NEEDED:
                parts[-1] += "''" if c == "'" else f"'{c}'"
            else:
                parts[-1] += c
            i += 1
    if frac_seen:
        return parts[0], parts[1]
    return parts[0], None


# strptime directive -> regex consuming exactly what flb_strptime would
_CONSUME_MAP = {
    "%Y": r"\d{4}",
    "%y": r"\d{2}",
    "%m": r"\d{1,2}",
    "%d": r"\d{1,2}",
    "%e": r"\s?\d{1,2}",
    "%b": r"[A-Za-z]{3}",
    "%B": r"[A-Za-z]+",
    "%a": r"[A-Za-z]{3}",
    "%A": r"[A-Za-z]+",
    "%H": r"\d{1,2}",
    "%I": r"\d{1,2}",
    "%M": r"\d{1,2}",
    "%S": r"\d{1,2}",
    "%p": r"[AaPp][Mm]",
    "%j": r"\d{1,3}",
    "%L": r"\d{1,9}",
    "%z": r"(?:[+-]\d{2}:?\d{2}|[+-]\d{2}|Z|UTC|GMT)",
    "%Z": r"[A-Za-z/_+-]+",
    "%s": r"\d+",
    "%%": r"%",
}

import re as _re


def strptime_consume_regex(fmt: str) -> str:
    """Anchored regex matching the prefix flb_strptime consumes.

    strptime stops at the end of the format and *ignores trailing
    text* (flb_parser.c time lookup checks only p != NULL) — e.g. the
    docker format '%Y-%m-%dT%H:%M:%S.%L' parses
    '2019-10-10T13:55:36.123Z' leaving 'Z' unconsumed. Spark's
    to_timestamp is whole-string, so we extract this prefix first.
    """
    out = ["^"]
    i = 0
    n = len(fmt)
    while i < n:
        if fmt[i] == "%" and i + 1 < n:
            d = fmt[i : i + 2]
            piece = _CONSUME_MAP.get(d)
            if piece is None:
                raise ValueError(f"unsupported strptime directive {d!r} in {fmt!r}")
            out.append(piece)
            i += 2
        elif fmt[i] == " ":
            # flb_strptime.c:277-283: format whitespace eats ZERO or
            # more input whitespace ('%L %z' must accept '.648-04:00')
            out.append(r"\s*")
            i += 1
        else:
            out.append(_re.escape(fmt[i]))
            i += 1
    return "".join(out)


def time_parse_col(
    col: Column | str,
    fmt: str,
    ref_year: int | None = None,
    time_offset_sec: int = 0,
) -> Column:
    """Compile a fluent-bit Time_Format parse into a timestamp Column.

    ``ref_year``: year injected when the format lacks one (None ->
    current UTC year at plan time via current_timestamp, evaluated by
    Catalyst). ``time_offset_sec``: fixed UTC offset applied when the
    format carries no timezone (parser Time_Offset option). Returns
    null (never throws) on unparseable input, like the reference's
    non-strict path.
    """
    c = F.col(col) if isinstance(col, str) else col
    if fmt.strip() == "%s":
        return F.to_timestamp(F.from_unixtime(c.cast("long")))

    # strptime prefix semantics: take exactly what the format consumes
    prefix_str = F.regexp_extract(c, strptime_consume_regex(fmt), 0)
    c = F.when(prefix_str != "", prefix_str)

    # Normalize ±HH:MM offsets to ±HHMM so java "XX" accepts all forms.
    if "%z" in fmt:
        if _re.search(r"\s+%z", fmt):
            # the format's whitespace matched zero-or-more input
            # whitespace above; the java pattern needs the literal
            # space, so canonicalize to exactly one before the offset
            c = F.regexp_replace(
                c, r"\s*([+-]\d{2}:?\d{2}|[+-]\d{2}|Z)$", r" $1"
            )
        c = F.regexp_replace(c, r"([+-]\d{2}):(\d{2})$", r"$1$2")

    if not has_year(fmt):
        year = (
            F.lit(str(ref_year))
            if ref_year is not None
            else F.date_format(F.current_timestamp(), "yyyy")
        )
        c = F.concat(year, F.lit(" "), c)
        fmt = "%Y " + fmt

    prefix, suffix = strptime_to_java(fmt)
    if suffix is None:
        ts = F.try_to_timestamp(c, F.lit(prefix))
    else:
        # Split out the fractional run: it sits right after the seconds
        # field, preceded by the literal before %L in the format (a '.'
        # in every reference config). Fixed-width lookbehind keeps us
        # from matching digit runs earlier in the string.
        sep_re, sep_java = _frac_sep(fmt)
        frac = F.regexp_extract(c, rf"(?<=:\d\d){sep_re}(\d{{1,9}})", 1)
        base = F.regexp_replace(c, rf"(?<=:\d\d){sep_re}\d{{1,9}}", "")
        # the separator literal was consumed along with the fraction
        assert prefix.endswith(sep_java), (prefix, sep_java)
        ts = F.try_to_timestamp(base, F.lit(prefix[: -len(sep_java)] + suffix))
        micros = F.rpad(F.substring(frac, 1, 6), 6, "0").cast("long")
        ts = F.when(frac == "", ts).otherwise(
            F.timestamp_micros(F.unix_micros(ts) + micros)
        )
    if time_offset_sec and not has_tz(fmt):
        ts = F.timestamp_seconds(F.unix_seconds(ts) - F.lit(time_offset_sec))
    return ts


def _frac_sep(fmt: str) -> tuple[str, str]:
    """(regex-escaped, java-pattern) forms of the literal before %L."""
    import re as _re

    idx = fmt.index("%L")
    if idx == 0 or fmt[idx - 1] == "%":
        raise ValueError(f"%L must follow a literal separator in {fmt!r}")
    sep = fmt[idx - 1]
    java = ("''" if sep == "'" else f"'{sep}'") if sep in _JAVA_QUOTE_NEEDED else sep
    return _re.escape(sep), java
