"""Vectorized HTML -> text extraction for Common-Crawl-style pages.

The north-star pipeline ingests pages ``(url, warc_ts, html, text,
lang)`` and must extract structured text from the raw ``html`` bytes
with BYTE-IDENTICAL output per url (BASELINE.json input_hint).  This
module is that extraction stage, built JVM-first:

- ``html_to_text_col`` — pure Catalyst: comment removal, script/style
  block removal, optional <body> isolation, tag stripping, named
  entity decoding.  Whole-stage-codegen regexp chain, no Python, no
  shuffle — the 100 TB path.
- ``html_to_text_arrow`` — Arrow-batched pandas UDF adding full
  numeric character references (&#NN; / &#xNN;) via the stdlib HTML
  entity table; the completeness path when pages carry arbitrary
  charrefs.
- ``escape_html_col`` — the inverse used by the deterministic page
  synthesiser, so round-trip byte-identity is testable end-to-end.

Entity decode order matters: ``&amp;`` must decode LAST or
``&amp;lt;`` would double-decode into ``<`` (same pitfall the
reference's escaped_utf8 decoder chain guards against,
`src/flb_parser_decoder.c`).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# named entities handled JVM-side; amp deliberately last
_NAMED_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def escape_html_col(col: Column) -> Column:
    """Minimal HTML escaping (&, <, > — ampersand first)."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def decode_entities_col(col: Column) -> Column:
    """Named-entity decode, JVM-side, amp last."""
    out = col
    for ent, ch in _NAMED_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def html_to_text_col(
    col: Column,
    keep: str = "body",
    collapse_ws: bool = False,
) -> Column:
    """Extract visible text from an HTML string/binary column.

    keep='body' isolates the <body> element first (page chrome like
    <title> does not leak into the text); keep='all' takes every text
    node.  collapse_ws=False preserves byte-identity of the source
    text nodes; True gives the normalized form typical for LLM
    corpus prep.
    """
    s = col.cast("string")
    # comments, then script/style blocks (their content may contain
    # '<' and quotes — remove the whole element before tag stripping)
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", "")
    s = F.regexp_replace(s, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", "")
    if keep == "body":
        body_rx = r"(?is)<body[^>]*>(.*?)</body\s*>"
        body = F.regexp_extract(s, body_rx, 1)
        # pages without a <body> element fall back to the whole doc;
        # regexp_extract returns '' for BOTH no-match and an empty
        # body, so presence is tested explicitly (an empty <body> must
        # yield '', not leak head/title text — html_to_text_arrow
        # distinguishes the same way via re.search)
        s = F.when(s.rlike(body_rx), body).otherwise(s)
    elif keep != "all":
        raise ValueError(f"keep must be 'body' or 'all', got {keep!r}")
    s = F.regexp_replace(s, r"<[^>]+>", "")
    s = decode_entities_col(s)
    if collapse_ws:
        s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return s


def html_to_text_arrow(
    col: Column,
    keep: str = "body",
    collapse_ws: bool = False,
) -> Column:
    """Arrow-batched variant with FULL entity/charref decoding
    (html.unescape covers &#NN;, &#xNN;, and the whole HTML5 named
    table).  Regex work is per-batch over pandas Series; use
    html_to_text_col when named entities suffice."""
    import html as _html
    import re as _re

    from pyspark.sql.functions import pandas_udf

    comment_re = _re.compile(r"<!--.*?-->", _re.S)
    block_re = _re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", _re.I | _re.S)
    body_re = _re.compile(r"<body[^>]*>(.*?)</body\s*>", _re.I | _re.S)
    tag_re = _re.compile(r"<[^>]+>")
    ws_re = _re.compile(r"\s+")
    keep_body = keep == "body"
    if keep not in ("body", "all"):
        raise ValueError(f"keep must be 'body' or 'all', got {keep!r}")

    @pandas_udf("string")
    def _extract(batch: pd.Series) -> pd.Series:
        def one(raw):
            if raw is None:
                return None
            s = raw.decode("utf-8", "replace") if isinstance(raw, (bytes, bytearray)) else raw
            s = comment_re.sub("", s)
            s = block_re.sub("", s)
            if keep_body:
                m = body_re.search(s)
                if m:
                    s = m.group(1)
            s = tag_re.sub("", s)
            s = _html.unescape(s)
            if collapse_ws:
                s = ws_re.sub(" ", s).strip()
            return s

        return batch.map(one)

    return _extract(col)
