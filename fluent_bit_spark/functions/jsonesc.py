"""flb_utils_write_str twin: the reference's JSON string renderer.

Reference: /root/reference/src/flb_utils.c:768-784 (escape table),
:791-1040 (flb_utils_write_str) — the function behind EVERY JSON
string the reference emits (flb_pack msgpack->JSON, sink bodies,
out_file json).  Semantics:

- ASCII specials per the lookup table: ``\"`` ``\\\\`` ``\\n \\r \\t
  \\b \\f`` and all remaining C0 controls plus 0x7F as lowercase
  ``\\u00xx``;
- every valid non-ASCII codepoint <= U+FFFF renders as lowercase
  ``\\uxxxx`` — the reference NEVER passes raw UTF-8 through;
- codepoints beyond the BMP render as a UTF-16 surrogate pair
  ``\\uhhhh\\ullll`` (:969-975);
- invalid UTF-8 inserts U+FFFD (:901-908).  Spark strings are
  already U+FFFD-substituted when decoded from bytes, so that branch
  happens upstream here; the one visible difference is that the C
  inserts the replacement char RAW while this twin escapes it as
  ``\\ufffd`` (documented deviation, unreachable for valid input).

The implementation mirrors the C's SIMD fast path (:823-840): a
single ``rlike`` gate passes clean ASCII through untouched, and only
strings containing specials/high bytes take the per-codepoint
transform (split('') is codepoint-aware in Java regex, so astral
chars arrive whole; ``encode(ch,'UTF-32')`` yields the codepoint).
All Catalyst — no Python.

Verified byte-exact against the reference's own fixture pairs
``tests/internal/data/pack/{utf8_*,mixed_*}.{txt,json}``
(test_utf8_to_json in tests/internal/pack.c:461) in
tests/test_jsonesc.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the 2-byte named escapes of json_escape_table (flb_utils.c:769-775)
_NAMED = {
    '"': '\\"',
    "\\": "\\\\",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}

# anything that forces the slow path: C0 controls, DEL, quote,
# backslash, or any non-ASCII char (the C's flb_vector8 tests)
_SLOW_RE = '[\\x00-\\x1f"\\\\\\x7f]|[^\\x00-\\x7f]'


def _cp(ch: Column) -> Column:
    """Codepoint of a single-char string via UTF-32 bytes (Java's
    UTF-32 charset encodes big-endian with no BOM)."""
    return F.conv(F.hex(F.encode(ch, "UTF-32")), 16, 10).cast("long")


def _hex4(n: Column) -> Column:
    return F.lower(F.lpad(F.hex(n), 4, "0"))


def flb_json_escape(col: Column) -> Column:
    """Render a string exactly as flb_utils_write_str would inside a
    JSON double-quoted literal (quotes themselves not included)."""
    named = F.create_map(*[
        F.lit(x) for kv in _NAMED.items() for x in kv
    ])

    def render(c):
        cp = _cp(c)
        look = F.element_at(named, c)
        high = (F.floor((cp - 0x10000) / 1024) + 0xD800).cast("long")
        low = ((cp - 0x10000) % 1024 + 0xDC00).cast("long")
        return (
            F.when(look.isNotNull(), look)
            .when((cp < 0x20) | (cp == 0x7F),
                  F.concat(F.lit("\\u"), _hex4(cp)))
            .when(cp < 0x80, c)
            .when(cp <= 0xFFFF, F.concat(F.lit("\\u"), _hex4(cp)))
            .otherwise(F.concat(F.lit("\\u"), _hex4(high),
                                F.lit("\\u"), _hex4(low)))
        )

    slow = F.array_join(
        F.transform(F.split(col, ""), render), ""
    )
    return F.when(col.rlike(_SLOW_RE), slow).otherwise(col)
