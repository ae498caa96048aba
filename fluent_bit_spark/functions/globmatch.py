"""fluent-bit tag glob matching, compiled to Spark predicates.

Reference semantics: ``router_match`` in
``/root/reference/src/flb_router.c:38-103`` — the only wildcard is
``*``; it matches any run of characters *including the empty string*
(successive ``*`` collapse; a trailing ``*`` matches the rest; a
mid-pattern ``*`` scans forward recursively). No ``?``, no character
classes. This is exactly ``.*`` regex semantics over an anchored
pattern, which is what we compile to so Catalyst can constant-fold the
predicate and (for literal prefixes) prune partitions of a
tag-partitioned table.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def glob_to_regex(match: str) -> str:
    """Compile a fluent-bit match rule to an anchored Java/RE2 regex."""
    out: list[str] = ["^"]
    i = 0
    n = len(match)
    while i < n:
        c = match[i]
        if c == "*":
            while i < n and match[i] == "*":
                i += 1
            out.append(".*")
            continue
        out.append(re.escape(c))
        i += 1
    out.append("$")
    return "".join(out)


def tag_glob_match(tag: str, match: str) -> bool:
    """Pure-Python oracle of router_match (flb_router.c:38-103)."""
    return re.match(glob_to_regex(match), tag, flags=re.DOTALL) is not None


def tag_match_col(tag_col: Column | str, match: str) -> Column:
    """Spark predicate Column: does ``tag_col`` match the glob rule?

    Special cases keep the predicate cheap and pushdown-friendly:
    ``*`` -> lit(True); no wildcard -> equality; ``prefix*`` ->
    startswith (sargable); otherwise an anchored rlike.
    """
    col = F.col(tag_col) if isinstance(tag_col, str) else tag_col
    if match == "*" or set(match) == {"*"}:
        return col.isNotNull()
    if "*" not in match:
        return col == match
    if match.endswith("*") and "*" not in match[:-1]:
        return col.startswith(match[:-1])
    if match.startswith("*") and "*" not in match[1:]:
        return col.endswith(match[1:])
    return col.rlike(glob_to_regex(match))
