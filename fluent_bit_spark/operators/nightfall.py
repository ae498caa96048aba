"""filter_nightfall: sensitive-content redaction mechanics.

Reference: /root/reference/plugins/filter_nightfall/nightfall.c —
the API response yields, per scannable field, a list of sensitive
[start, end) byte ranges (nightfall_api.c:369-460 packs
``findings[].location.byteRange``); ``maybe_redact_field`` (:397-455)
then masks string fields in place with '*' over each clamped range and
replaces integer fields entirely with the literal six asterisks —
packed with length 7, so the reference emits a trailing NUL byte
("******\\0", :431); records with no findings pass through unchanged.
``sampling_rate`` (0,1] randomly selects records for scanning (:71).

Spark split mirrors the plugin's scan/redact phases:
- ``scan_local``: a findings generator with the Nightfall response
  SHAPE (per-column array of [start, end) ranges) driven by local
  regex detectors over Arrow batches — the sandbox stand-in for the
  HTTPS detection API, which is out of scope (SURVEY §2.4 network
  enrichers). Offsets are character offsets (byte == char for ASCII;
  the API's byte offsets differ only on multi-byte text).
- ``redact_with_findings``: the masking mechanics in pure Catalyst —
  a sequential fold over the ranges builds the masked string, exactly
  clamped like the C loop (start floored at 0, end capped at len).
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# msgpack_pack_str_with_body(pk, "******", 7) — six asterisks plus the
# C string's NUL terminator (nightfall.c:431, length-7 quirk kept)
INT_REDACTION = "******\x00"


def mask_ranges(col: Column, ranges: Column) -> Column:
    """Mask [start, end) ranges of a string with '*' (the
    maybe_redact_field string loop): start floored at 0, end capped at
    the current length; overlapping ranges compose the same way the
    sequential C loop does."""
    return F.aggregate(
        ranges,
        col,
        lambda acc, r: F.concat(
            F.substring(acc, 1, F.greatest(r[0], F.lit(0)).cast("int")),
            F.repeat(
                F.lit("*"),
                (
                    F.least(r[1], F.length(acc).cast("long"))
                    - F.greatest(r[0], F.lit(0))
                ).cast("int"),
            ),
            F.substring(
                acc,
                F.least(r[1], F.length(acc).cast("long")).cast("int") + 1,
                F.length(acc),
            ),
        ),
    )


def redact_with_findings(
    df: DataFrame, findings: dict[str, str]
) -> DataFrame:
    """Apply the redaction mechanics: ``findings`` maps a record
    column to a column holding array<array<long>> (the per-field
    [start, end) list; empty/NULL means nothing sensitive). String
    fields are range-masked; integer fields with any finding become
    the reference's 7-byte asterisk literal (and therefore turn into
    strings, as in the C record rewrite)."""
    out = df
    for col, fcol in findings.items():
        dt = out.schema[col].dataType.simpleString()
        has = F.col(fcol).isNotNull() & (F.size(F.col(fcol)) > 0)
        if dt in ("tinyint", "smallint", "int", "bigint", "long"):
            red = F.when(has, F.lit(INT_REDACTION)).otherwise(
                F.col(col).cast("string")
            )
        else:
            red = F.when(
                has, mask_ranges(F.col(col), F.col(fcol))
            ).otherwise(F.col(col))
        out = out.withColumn(col, red)
    return out


def scan_local(
    df: DataFrame, cols: list[str], detectors: dict[str, str]
) -> DataFrame:
    """Arrow-batched local detector pass producing Nightfall-shaped
    findings: one ``<col>__findings`` array<array<long>> per scanned
    column (match [start, end) per detector hit, merged across
    detectors in scan order)."""
    import pandas as pd

    compiled = [(name, re.compile(rx)) for name, rx in detectors.items()]
    fcols = [f"{c}__findings" for c in cols]
    schema = df.schema.simpleString()[7:-1]  # struct<...> -> ...
    out_schema = ", ".join(
        [schema] + [f"{fc}: array<array<bigint>>" for fc in fcols]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for c in cols:
                found = []
                for v in pdf[c].astype("string"):
                    if v is None or pd.isna(v):
                        found.append([])
                        continue
                    spans = []
                    for _, rx in compiled:
                        spans += [list(m.span()) for m in rx.finditer(v)]
                    found.append(spans)
                pdf[f"{c}__findings"] = found
            yield pdf

    return df.mapInPandas(scan, out_schema)


def nightfall_redact(
    df: DataFrame,
    cols: list[str],
    detectors: dict[str, str],
) -> DataFrame:
    """scan_local + redact_with_findings, dropping the findings
    columns — the full filter pass."""
    scanned = scan_local(df, cols, detectors)
    red = redact_with_findings(
        scanned, {c: f"{c}__findings" for c in cols}
    )
    return red.drop(*[f"{c}__findings" for c in cols])
