"""processor_opentelemetry_envelope: wrap log records in OTLP groups.

Reference `plugins/processor_opentelemetry_envelope/otel_envelope.c`:
for each run of normal records in a chunk, insert a GROUP_START
record carrying metadata {schema: "otlp", resource_id: 0,
scope_id: 0} and an empty {resource: {}, scope: {}} body
(`otel_envelope.c` envelop_init), and a GROUP_END marker after the
run (envelop_end).  The record stream is sequential in the reference;
in Spark, rows are unordered, so the chunk run becomes an explicit
GROUP — the columns in ``group_cols`` (typically the tag, or
tag+chunk id) — and reconstruction order is carried by
(``group_cols``, seq) where seq is 0 for the start marker, 1 for
payload rows, 2 for the end marker.

Two forms:

- ``otel_envelope_cols``: attach the envelope metadata to every row
  as columns — the idiomatic columnar form (group membership as data,
  no marker rows).  Narrow, zero-shuffle.
- ``otel_envelope_rows``: reproduce the reference's record layout
  exactly — one start and one end marker row per group around the
  payload rows.  One distinct over the group key (map-side partial
  agg) + union; payload rows themselves are untouched (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_META_COLS = ("record_type", "otel_schema", "resource_id", "scope_id", "seq")


def otel_envelope_cols(
    df: DataFrame,
    schema: str = "otlp",
    resource_id: int = 0,
    scope_id: int = 0,
) -> DataFrame:
    """Columnar form: every record carries its envelope metadata."""
    return (
        df.withColumn("otel_schema", F.lit(schema))
        .withColumn("resource_id", F.lit(resource_id).cast("long"))
        .withColumn("scope_id", F.lit(scope_id).cast("long"))
        .withColumn("resource", F.create_map().cast("map<string,string>"))
        .withColumn("scope", F.create_map().cast("map<string,string>"))
    )


def otel_envelope_rows(
    df: DataFrame,
    group_cols: list[str],
    schema: str = "otlp",
    resource_id: int = 0,
    scope_id: int = 0,
) -> DataFrame:
    """Marker-row form mirroring the reference's chunk layout.

    Output = group_cols + record_type/otel_schema/resource_id/
    scope_id/seq + the original payload columns (NULL on markers).
    Sort by (group_cols..., seq) to recover the reference's
    start -> records -> end sequence.
    """
    for c in _META_COLS:
        if c in df.columns:
            raise ValueError(f"column {c!r} already present")

    payload_cols = [c for c in df.columns if c not in group_cols]
    payload_types = dict((f.name, f.dataType) for f in df.schema.fields)

    def _null_payload():
        return [
            F.lit(None).cast(payload_types[c]).alias(c) for c in payload_cols
        ]

    groups = df.select(*group_cols).distinct()
    start = groups.select(
        *group_cols,
        F.lit("group_start").alias("record_type"),
        F.lit(schema).alias("otel_schema"),
        F.lit(resource_id).cast("long").alias("resource_id"),
        F.lit(scope_id).cast("long").alias("scope_id"),
        F.lit(0).alias("seq"),
        *_null_payload(),
    )
    normal = df.select(
        *group_cols,
        F.lit("normal").alias("record_type"),
        F.lit(None).cast("string").alias("otel_schema"),
        F.lit(None).cast("long").alias("resource_id"),
        F.lit(None).cast("long").alias("scope_id"),
        F.lit(1).alias("seq"),
        *payload_cols,
    )
    end = groups.select(
        *group_cols,
        F.lit("group_end").alias("record_type"),
        F.lit(None).cast("string").alias("otel_schema"),
        F.lit(None).cast("long").alias("resource_id"),
        F.lit(None).cast("long").alias("scope_id"),
        F.lit(2).alias("seq"),
        *_null_payload(),
    )
    return start.unionAll(normal).unionAll(end)
