"""Enrichment: broadcast lookup joins (the reference's only join shape).

Reference has no record×record join — its "joins" are per-record
lookups into static tables:
- filter_geoip2: lookup_key -> mmdb fields added to the record
  (/root/reference/plugins/filter_geoip2/geoip2.c:141-170, :196)
- filter_checklist: membership in a value file sets flag keys
  (plugins/filter_checklist/checklist.h:36-48, checklist.c:416)
- filter_kubernetes: (namespace,pod) -> metadata cache
  (plugins/filter_kubernetes/kubernetes.c:243-280)

All three are exactly broadcast hash joins: the lookup side is small
(an mmdb / a value file / a metadata snapshot), so it ships to every
executor and the 100 TB fact side never shuffles. ``broadcast()`` is
applied explicitly — at 10^12 rows a sort-merge join here would be
the single worst plan regression available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_join(
    df: DataFrame,
    lookup: DataFrame,
    key: str,
    lookup_key: str | None = None,
    add_fields: dict[str, str] | None = None,
) -> DataFrame:
    """filter_geoip2-shaped enrich: left broadcast join, add chosen fields.

    ``add_fields`` maps new record key -> lookup column (the plugin's
    ``Record new_key lookup_field`` directives). None adds every
    non-key lookup column under its own name.
    """
    lk = lookup_key or key
    if add_fields is None:
        add_fields = {c: c for c in lookup.columns if c != lk}
    proj = [F.col(lk).alias("_lookup_key")] + [
        F.col(src).alias(dst) for dst, src in add_fields.items()
    ]
    small = lookup.select(*proj).dropDuplicates(["_lookup_key"])
    out = df.join(
        F.broadcast(small), on=df[key] == small["_lookup_key"], how="left"
    ).drop("_lookup_key")
    return out


def checklist(
    df: DataFrame,
    values: DataFrame | list[str],
    lookup_key: str,
    records: dict[str, str] | None = None,
    mode: str = "exact",
    ignore_case: bool = False,
) -> DataFrame:
    """filter_checklist: set ``records`` k/v on rows whose lookup_key
    value appears in the list (plugins/filter_checklist/checklist.c —
    ``mode`` exact/partial, ``ignore_case``, one ``record k v`` per
    rewrite; non-matched rows keep their original values). Small lists
    fold to an ``isin`` literal (pure Catalyst, partition-prunable);
    larger ones broadcast-join.
    """
    records = records or {"matched": "true"}
    key = F.col(lookup_key)
    if ignore_case:
        key = F.lower(key)

    def norm(v: str) -> str:
        return v.lower() if ignore_case else v

    if isinstance(values, list):
        if mode == "partial":
            hit = F.lit(False)
            for v in values:
                hit = hit | key.contains(norm(v))
        else:
            hit = key.isin([norm(v) for v in values])
    else:
        vcol = values.columns[0]
        vexpr = F.col(vcol)
        if ignore_case:
            vexpr = F.lower(vexpr)
        small = values.select(vexpr.alias("_cl_value")).dropDuplicates()
        df = df.join(
            F.broadcast(small), on=key == small["_cl_value"], how="left"
        )
        hit = F.col("_cl_value").isNotNull()
    # materialize the match BEFORE any rewrite: a `record` targeting
    # the lookup_key itself must not change later rules' verdicts
    df = df.withColumn("_cl_hit", hit)
    hit = F.col("_cl_hit")
    for k, v in records.items():
        old = (
            F.col(k).cast("string") if k in df.columns
            else F.lit(None).cast("string")
        )
        df = df.withColumn(k, F.when(hit, F.lit(v)).otherwise(old))
    return df.drop("_cl_value", "_cl_hit")
