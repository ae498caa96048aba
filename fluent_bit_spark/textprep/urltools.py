"""URL parsing, normalization, and blocklist filtering.

Every web-corpus pipeline gates on URLs before it ever reads a page
body: C4 dropped pages from a bad-word domain list, RefinedWeb used
the UT1 blocklists plus URL-keyword scoring. The distributed shape is
(a) pure string parsing per row (host / registrable domain / path),
(b) a broadcast join against a (tiny) blocklist dim table, and (c) a
regex gate on the path — all Catalyst, no Python.

Host parsing is a portable regex (identical pattern in both
dialects) rather than Spark's parse_url, so the DuckDB oracle
reproduces it bit-for-bit. Registrable-domain extraction uses an
embedded mini public-suffix list (the handful of two-label suffixes
needed for tests); swap ``MULTI_LABEL_SUFFIXES`` for the full PSL in
production — the expression shape does not change.

Scale notes (100 TB): everything here is per-row codegen; the
blocklist join broadcasts (blocklists are < 10^6 rows); no shuffle is
introduced at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# two-label public suffixes the registrable-domain logic recognizes
# (mini PSL; production swaps in the full list, same expression)
MULTI_LABEL_SUFFIXES = ["co.uk", "com.au", "co.jp", "com.br"]

_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"
BAD_PATH_WORDS = ["casino", "viagra", "xxx"]


def _spark_reg_domain(host: str) -> str:
    """Registrable domain: last 2 labels, or 3 when the last 2 form a
    known multi-label public suffix."""
    suff = ",".join(f"'{s}'" for s in MULTI_LABEL_SUFFIXES)
    parts = f"split({host}, '\\\\.')"
    return (
        f"CASE WHEN size({parts}) <= 2 THEN {host} "
        f"WHEN array_contains(array({suff}),"
        f" concat_ws('.', slice({parts}, -2, 2))) "
        f"THEN concat_ws('.', slice({parts}, -3, 3)) "
        f"ELSE concat_ws('.', slice({parts}, -2, 2)) END"
    )


def _duck_reg_domain(host: str) -> str:
    suff = ",".join(f"'{s}'" for s in MULTI_LABEL_SUFFIXES)
    parts = f"string_split({host}, '.')"
    return (
        f"CASE WHEN len({parts}) <= 2 THEN {host} "
        f"WHEN list_contains([{suff}],"
        f" array_to_string({parts}[-2:], '.')) "
        f"THEN array_to_string({parts}[-3:], '.') "
        f"ELSE array_to_string({parts}[-2:], '.') END"
    )


def url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds host, reg_domain, path, norm_url (query/fragment stripped,
    lowercase host, no trailing slash)."""
    host = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    path = F.regexp_extract(F.col(url_col), _PATH_RE, 1)
    out = df.withColumn("host", host).withColumn("path", path)
    out = out.withColumn("reg_domain", F.expr(_spark_reg_domain("host")))
    scheme = F.regexp_extract(F.col(url_col), "^([a-z][a-z0-9+.-]*)://", 1)
    clean_path = F.regexp_replace(F.col("path"), "/+$", "")
    return out.withColumn(
        "norm_url", F.concat(scheme, F.lit("://"), F.col("host"), clean_path)
    )


def url_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    bad_path_words: list[str] | None = None,
) -> DataFrame:
    """URL gate: blocklist (broadcast join on reg_domain) + path-keyword
    regex. Adds blocked_domain, blocked_path, url_allow."""
    words = bad_path_words or BAD_PATH_WORDS
    parts = url_parts(df, url_col)
    bl = F.broadcast(
        blocklist.select(F.col("reg_domain").alias("_bl_domain")).distinct()
    )
    out = parts.join(
        bl, parts["reg_domain"] == bl["_bl_domain"], "left"
    ).withColumn("blocked_domain", F.col("_bl_domain").isNotNull()).drop("_bl_domain")
    pat = "(?i)(" + "|".join(words) + ")"
    out = out.withColumn("blocked_path", F.col("path").rlike(pat))
    return out.withColumn(
        "url_allow", ~F.col("blocked_domain") & ~F.col("blocked_path")
    )


def duck_url_parts(url: str) -> dict[str, str]:
    """DuckDB renderings of the url_parts columns."""
    host = f"lower(regexp_extract({url}, '{_HOST_RE}', 1))"
    path = f"regexp_extract({url}, '{_PATH_RE}', 1)"
    return {
        "host": host,
        "path": path,
        "reg_domain": _duck_reg_domain(host),
        "norm_url": (
            f"regexp_extract({url}, '^([a-z][a-z0-9+.-]*)://', 1) || '://' || {host}"
            f" || regexp_replace({path}, '/+$', '')"
        ),
        "blocked_path_pat": "(?i)(" + "|".join(BAD_PATH_WORDS) + ")",
    }
