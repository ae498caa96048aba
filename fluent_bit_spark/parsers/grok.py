"""Grok pattern front-end: ``%{NAME:field:type}`` macros expand into
the named-group regex the existing parser machinery already compiles
(parsers/compile.py JVM regexp_extract columns), so a grok parse is a
regex parse after one string rewrite — no new execution path.

Grok semantics follow the Logstash/Elastic convention (the public
reference for the syntax): ``%{PATTERN}`` expands non-capturing,
``%{PATTERN:field}`` captures under ``field``, ``%{PATTERN:field:int}``
/ ``:float`` adds a typecast. Patterns may reference other patterns;
expansion is recursive with a cycle guard. The built-in library below
is the commonly used core subset (the full Elastic set is hundreds of
aliases); ``custom`` merges project-specific patterns over it.

Scale note: the output is a single Java regex evaluated inside
whole-stage codegen per capture via ``regexp_extract`` — identical
cost profile to the reference-config regex parsers (PLANS.md
"parse stage inside WholeStageCodegen").
"""

from __future__ import annotations

import re

from fluent_bit_spark.parsers.config import ParserSpec

# the commonly used core subset of the public grok pattern library
PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "POSINT": r"\b[1-9]\d*\b",
    "NONNEGINT": r"\b\d+\b",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "NUMBER": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "QUOTEDSTRING": r"\"[^\"]*\"",
    "QS": r"%{QUOTEDSTRING}",
    "UUID": r"[0-9a-fA-F]{8}(?:-[0-9a-fA-F]{4}){3}-[0-9a-fA-F]{12}",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|CRIT(?:ICAL)?|FATAL|SEVERE|EMERG(?:ENCY)?)",
    "MONTHDAY": r"(?:0?[1-9]|[12]\d|3[01])",
    "YEAR": r"\d{4}",
    "HOUR": r"(?:[01]?\d|2[0-3])",
    "MINUTE": r"[0-5]\d",
    "SECOND": r"(?:[0-5]?\d)(?:\.\d+)?",
    "TIME": r"%{HOUR}:%{MINUTE}:%{SECOND}",
    "TIMESTAMP_ISO8601": r"%{YEAR}-\d{2}-%{MONTHDAY}[T ]%{HOUR}:%{MINUTE}(?::%{SECOND})?(?:Z|[+-]\d{2}:?\d{2})?",
    "HTTPDATE": r"%{MONTHDAY}/\w{3}/%{YEAR}:%{TIME} [+-]\d{4}",
}

_GROK_RE = re.compile(
    r"%\{(?P<name>[A-Z0-9_]+)(?::(?P<field>[A-Za-z0-9_]+))?(?::(?P<type>int|float|string|bool))?\}"
)

_TYPE_MAP = {"int": "integer", "float": "float", "string": "string", "bool": "bool"}


def grok_to_regex(
    pattern: str,
    custom: dict[str, str] | None = None,
) -> tuple[str, dict[str, str]]:
    """Expand a grok pattern into (named-group regex, field->type map).
    Unknown pattern names and reference cycles raise."""
    lib = {**PATTERNS, **(custom or {})}
    types: dict[str, str] = {}

    def expand(p: str, seen: tuple[str, ...]) -> str:
        def repl(m: re.Match) -> str:
            name = m.group("name")
            if name not in lib:
                raise ValueError(f"unknown grok pattern %{{{name}}}")
            if name in seen:
                raise ValueError(f"grok pattern cycle through %{{{name}}}")
            body = expand(lib[name], seen + (name,))
            field = m.group("field")
            if field:
                if m.group("type"):
                    types[field] = _TYPE_MAP[m.group("type")]
                return f"(?<{field}>{body})"
            return f"(?:{body})"

        return _GROK_RE.sub(repl, p)

    return expand(pattern, ()), types


def grok_parser(
    name: str,
    pattern: str,
    custom: dict[str, str] | None = None,
    time_key: str | None = None,
    time_format: str | None = None,
) -> ParserSpec:
    """A grok pattern as a ParserSpec — drop-in everywhere a [PARSER]
    regex spec works (apply_parser, filter_parser, classic configs)."""
    regex, types = grok_to_regex(pattern, custom)
    return ParserSpec(
        name=name,
        format="regex",
        regex=regex,
        types=types,
        time_key=time_key,
        time_format=time_format,
    )
