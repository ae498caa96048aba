"""filter_sysinfo: append host/os/version keys to every record.

Reference: /root/reference/plugins/filter_sysinfo/sysinfo.c (282 LoC):
config keys fluentbit_version_key, os_name_key, hostname_key, ...
each adding one literal string column. Driver-side info folds to
constant columns — Catalyst constant-folds them to zero per-row cost.
"""

from __future__ import annotations

import platform

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark import __version__


def sysinfo(
    df: DataFrame,
    version_key: str | None = None,
    os_name_key: str | None = None,
    hostname_key: str | None = None,
) -> DataFrame:
    if version_key:
        df = df.withColumn(version_key, F.lit(__version__))
    if os_name_key:
        df = df.withColumn(os_name_key, F.lit(platform.system().lower()))
    if hostname_key:
        df = df.withColumn(hostname_key, F.lit(platform.node()))
    return df
