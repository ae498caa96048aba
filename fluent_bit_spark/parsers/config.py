"""[PARSER] config-file front-end.

Parses fluent-bit parser definitions (the format of
/root/reference/conf/parsers.conf) into ParserSpec values that the
compiler (parsers/compile.py) turns into columnar extraction plans.

Reference reader: flb_parser_conf_file / flb_parser_create
(/root/reference/src/flb_parser.c). Supported keys: Name, Format
(regex|json|ltsv|logfmt), Regex, Time_Key, Time_Format, Time_Keep,
Time_Offset, Types (k:int k2:float ...), Decode_Field / Decode_Field_As.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class DecoderRule:
    """One Decode_Field(_As) directive (src/flb_parser_decoder.c:632-725).

    mode 'as' replaces the field value in place; mode 'field' decodes
    and merges extracted keys alongside (DEC_AS vs DEC_DEFAULT,
    include/fluent-bit/flb_parser_decoder.h:28-35).
    """

    mode: str  # "as" | "field"
    decoder: str  # json | escaped | escaped_utf8 | mysql_quoted
    key: str
    # Chaining action (flb_parser_decoder.c:718-731): try_next =
    # continue to next rule ONLY on failure; do_next = always continue;
    # none (the calloc default when the 3rd token is absent) = stop
    # after this rule either way.
    action: str = "none"  # none | try_next | do_next


@dataclass
class ParserSpec:
    name: str
    format: str  # regex | json | ltsv | logfmt
    regex: str | None = None
    time_key: str | None = None
    time_format: str | None = None
    time_keep: bool = False
    time_offset: int = 0
    time_strict: bool = True
    types: dict[str, str] = field(default_factory=dict)
    decoders: list[DecoderRule] = field(default_factory=list)
    # ``Keys`` declaration (loader extension): the key set a map-format
    # parser (json/ltsv/logfmt) emits, declared up front so pipeline
    # construction never has to run a sampling job to learn the schema
    # (regex parsers already declare theirs via named groups).
    keys: list[str] | None = None

    def declared_keys(self) -> list[str] | None:
        """Statically-known output keys, or None if only a data
        sample can tell. Order: regex capture order / Keys order. A
        ``Types`` declaration deliberately does NOT count: it types
        SOME keys, it does not enumerate the record — treating it as
        the full key set would silently drop every untyped key."""
        if self.format == "regex":
            return self.named_groups()
        if self.keys is not None:
            return list(self.keys)
        return None

    def named_groups(self) -> list[str]:
        """Capture-field names in pattern order (regex format only)."""
        if not self.regex:
            return []
        return [m.group(1) for m in re.finditer(r"\(\?<([A-Za-z_][A-Za-z0-9_]*)>", self.regex)]


_TYPE_ALIASES = {
    "integer": "integer",
    "int": "integer",
    "float": "float",
    "bool": "bool",
    "boolean": "bool",
    "string": "string",
    "hex": "hex",
}


def _parse_types(value: str) -> dict[str, str]:
    """``Types code:integer size:integer`` (flb_parser.c:1280-1350)."""
    out: dict[str, str] = {}
    for tok in value.split():
        if ":" not in tok:
            continue
        k, t = tok.split(":", 1)
        t = _TYPE_ALIASES.get(t.strip().lower())
        if t:
            out[k.strip()] = t
    return out


def _strip_regex_slashes(rx: str) -> str:
    """Fluent-bit accepts /.../-delimited regexes (syslog-rfc3164 uses them)."""
    rx = rx.strip()
    if len(rx) >= 2 and rx.startswith("/") and rx.endswith("/"):
        return rx[1:-1]
    return rx


def parse_parsers_conf(text: str) -> dict[str, ParserSpec]:
    """Parse the ini-ish fluent-bit parsers file into specs by name."""
    specs: dict[str, ParserSpec] = {}
    cur: dict[str, str] | None = None
    decoders: list[DecoderRule] = []

    def flush() -> None:
        nonlocal cur, decoders
        if cur is None:
            return
        name = cur.get("name")
        fmt = cur.get("format", "").lower()
        regex = _strip_regex_slashes(cur["regex"]) if "regex" in cur else None
        if fmt == "grok":
            # loader extension (fluent-bit has no grok format; the
            # north-star parse stage names it): Grok_Pattern expands
            # to a named-group regex and the spec proceeds as Format
            # regex — same machinery, same plan
            from fluent_bit_spark.parsers.grok import grok_to_regex

            pattern = cur.get("grok_pattern")
            if not pattern:
                raise ValueError(f"[PARSER] {name}: Format grok needs Grok_Pattern")
            regex, grok_types = grok_to_regex(pattern)
            fmt = "regex"
            # merge as dicts, explicit Types winning — a substring test
            # on the raw Types string would drop a grok cast whenever a
            # field name is a substring of any existing types text
            merged = dict(grok_types)
            merged.update(_parse_types(cur.get("types", "")))
            cur["types"] = " ".join(f"{k}:{t}" for k, t in merged.items())
        if name and fmt:
            specs[name] = ParserSpec(
                name=name,
                format=fmt,
                regex=regex,
                time_key=cur.get("time_key"),
                time_format=cur.get("time_format"),
                time_keep=cur.get("time_keep", "").lower() == "on",
                time_offset=_parse_offset(cur.get("time_offset", "0")),
                time_strict=cur.get("time_strict", "on").lower() != "off",
                types=_parse_types(cur.get("types", "")),
                decoders=list(decoders),
                keys=(
                    cur["keys"].replace(",", " ").split()
                    if "keys" in cur
                    else None
                ),
            )
        cur = None
        decoders = []

    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.upper() == "[PARSER]":
            flush()
            cur = {}
            continue
        if line.startswith("[") or cur is None:
            flush()
            continue
        m = re.match(r"(\S+)\s+(.*)$", line)
        if not m:
            continue
        key, value = m.group(1).lower(), m.group(2).strip()
        if key in ("decode_field", "decode_field_as"):
            toks = value.split()
            if len(toks) >= 2:
                decoders.append(
                    DecoderRule(
                        mode="as" if key.endswith("_as") else "field",
                        decoder=toks[0].lower(),
                        key=toks[1],
                        action=(toks[2].lower() if len(toks) > 2 else "none"),
                    )
                )
        else:
            cur[key] = value
    flush()
    return specs


def _parse_offset(v: str) -> int:
    """Time_Offset like +0200 / -07:30 -> seconds."""
    v = v.strip()
    m = re.fullmatch(r"([+-]?)(\d{1,2}):?(\d{2})?", v)
    if not m:
        return 0
    sign = -1 if m.group(1) == "-" else 1
    hours = int(m.group(2))
    mins = int(m.group(3) or 0)
    return sign * (hours * 3600 + mins * 60)
