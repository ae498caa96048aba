"""Pure-Python reference oracle.

An independent, row-at-a-time evaluator of the pipeline semantics —
deliberately written like the reference engine (per-record loops,
Python re/strptime) and sharing NO code with the Spark implementation,
so routed-row equality between the two is meaningful evidence
(BASELINE.md correctness gate).

Implements: format guard, apache/syslog/json/ltsv/logfmt parse, time
rules (%z, %L truncation, missing-year injection), tag derivation,
glob routing (flb_router.c semantics via functions/globmatch's pure
matcher — itself unit-tested against hand cases), rewrite_tag, and
per-sink aggregate counts.
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timezone
from urllib.parse import urlparse

from fluent_bit_spark.functions.globmatch import tag_glob_match

APACHE_RE = re.compile(
    r'^(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}) [^ ]* ([^ ]*) \[([^\]]*)\] '
    r'"(\S+)(?: +([^"]*?)(?: +\S*)?)?" ([^ ]*) ([^ ]*)'
)
SYSLOG_RE = re.compile(
    r"^<(\d+)>([A-Za-z]{3} [ \d]\d \d\d:\d\d:\d\d) ([^ ]*) "
    r"([A-Za-z0-9_\/\.\-]*)(?:\[(\d+)\])?(?:[^\:]*\:)? *(.*)$"
)


def parse_apache_time(s: str) -> datetime | None:
    try:
        return datetime.strptime(s, "%d/%b/%Y:%H:%M:%S %z").astimezone(timezone.utc)
    except ValueError:
        return None


def parse_iso_frac(s: str) -> datetime | None:
    m = re.match(r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})\.(\d{1,9})", s or "")
    if not m:
        return None
    micros = int(m.group(7)[:6].ljust(6, "0"))
    return datetime(
        int(m.group(1)), int(m.group(2)), int(m.group(3)),
        int(m.group(4)), int(m.group(5)), int(m.group(6)), micros,
        tzinfo=timezone.utc,
    )


def parse_syslog_time(s: str, ref_year: int) -> datetime | None:
    try:
        dt = datetime.strptime(f"{ref_year} {s}", "%Y %b %d %H:%M:%S")
        return dt.replace(tzinfo=timezone.utc)
    except ValueError:
        return None


def detect_format(text: str) -> str:
    if text.startswith("{"):
        return "json"
    if text.startswith("<"):
        return "syslog"
    if "\t" in text:
        return "ltsv"
    if re.match(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3} ", text):
        return "apache"
    return "logfmt"


def _to_int(v):
    try:
        return int(v)
    except (TypeError, ValueError):
        return None


def parse_record(text: str, ref_year: int = 2026) -> dict:
    fmt = detect_format(text)
    out: dict = {
        "fmt": fmt, "host": None, "user": None, "method": None, "path": None,
        "code": None, "size": None, "level": None, "message": None,
        "event_time": None, "_parse_ok": False,
    }
    if fmt == "apache":
        m = APACHE_RE.match(text)
        if m:
            out.update(
                host=m.group(1), user=m.group(2) or None, method=m.group(4),
                path=m.group(5), code=_to_int(m.group(6)), size=_to_int(m.group(7)),
                event_time=parse_apache_time(m.group(3)), _parse_ok=True,
            )
    elif fmt == "syslog":
        m = SYSLOG_RE.match(text)
        if m:
            out.update(
                host=m.group(3), level=m.group(4), message=m.group(6),
                event_time=parse_syslog_time(m.group(2), ref_year), _parse_ok=True,
            )
    elif fmt == "json":
        try:
            obj = json.loads(text)
            out.update(
                message=obj.get("log"),
                event_time=parse_iso_frac(obj.get("time", "")),
                _parse_ok=isinstance(obj, dict),
            )
        except json.JSONDecodeError:
            pass
    elif fmt == "ltsv":
        fields: dict[str, str] = {}
        for part in text.split("\t"):
            if ":" in part:
                k, v = part.split(":", 1)
                fields[k] = v
        if fields:
            out.update(
                host=fields.get("host"), path=fields.get("path"),
                code=_to_int(fields.get("status")), size=_to_int(fields.get("size")),
                event_time=parse_iso_frac(fields.get("time", "")), _parse_ok=True,
            )
    else:  # logfmt (generated subset: no quotes-in-quotes edge cases)
        fields = {}
        for m in re.finditer(r'([^\s="]+)=("([^"]*)"|[^\s]*)', text):
            fields[m.group(1)] = m.group(3) if m.group(3) is not None else m.group(2)
        if fields:
            out.update(
                level=fields.get("level"), message=fields.get("msg"),
                code=_to_int(fields.get("status")), size=_to_int(fields.get("bytes")),
                event_time=parse_iso_frac(fields.get("ts", "")), _parse_ok=True,
            )
    return out


def evaluate(
    rows: list[dict],
    routes: list[tuple[str, str]],
    rewrites: list[tuple[str, str, bool]] | None = None,
    ref_year: int = 2026,
) -> tuple[list[tuple], dict[str, int]]:
    """rows: dicts with url/text/lang/warc_ts. routes: (sink, glob).
    rewrites: (regex-on-code, new_tag_prefix, keep) simplified to the
    5xx fixture shape. Returns (routed rows as (sink, url, tag, code),
    per-sink counts)."""
    routed: list[tuple] = []
    counts: dict[str, int] = {}
    for row in rows:
        rec = parse_record(row["text"], ref_year)
        fqdn = urlparse(row["url"]).netloc
        tld = fqdn.rsplit(".", 1)[-1]
        tag = f"web.{row['lang']}.{tld}"
        emitted = [(tag, rec)]
        if rewrites:
            for pattern, template, keep in rewrites:
                if rec["code"] is not None and re.search(pattern, str(rec["code"])):
                    new_tag = template.replace("$TAG[1]", tag.split(".")[1])
                    emitted = ([(tag, rec)] if keep else []) + [(new_tag, rec)]
                    break
        for t, r in emitted:
            for sink, glob in routes:
                if tag_glob_match(t, glob):
                    routed.append((sink, row["url"], t, r["code"]))
                    counts[sink] = counts.get(sink, 0) + 1
    return routed, counts
