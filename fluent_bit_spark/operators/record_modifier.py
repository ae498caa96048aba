"""filter_record_modifier: project-out / project-in / static adds / uuid.

Reference: /root/reference/plugins/filter_record_modifier/
filter_modifier.c:298 (callback), filter_modifier.h:42-60.
remove_key drops listed keys; allowlist_key (alias whitelist_key)
keeps ONLY listed keys; records (static k=v) are appended; uuid_key
appends a v4 uuid. allowlist and remove are mutually exclusive in the
reference config; we apply remove first, then allowlist, matching the
callback's branch order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def record_modifier(
    df: DataFrame,
    remove_keys: list[str] | None = None,
    allowlist_keys: list[str] | None = None,
    records: dict[str, str] | None = None,
    uuid_key: str | None = None,
) -> DataFrame:
    if remove_keys:
        df = df.drop(*[k for k in remove_keys if k in df.columns])
    if allowlist_keys:
        keep = [k for k in df.columns if k in set(allowlist_keys)]
        df = df.select(*keep)
    for k, v in (records or {}).items():
        df = df.withColumn(k, F.lit(v))
    if uuid_key:
        df = df.withColumn(uuid_key, F.expr("uuid()"))
    return df
