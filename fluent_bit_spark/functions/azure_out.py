"""out_azure (Log Analytics Data Collector API) encoding + signing.

Reference: /root/reference/plugins/out_azure/azure.c
- azure_format (:55-160): the HTTP body is one JSON array of records,
  each with ``time_key`` (default "@timestamp", azure.h:28) PREPENDED;
  the value is ISO8601 with 3-digit millis + Z when ``time_generated``
  is on (:129-140) and the plain epoch double otherwise (:141-145).
- build_headers (:186-290): ``x-ms-date`` is RFC1123 GMT, and the
  Authorization header is ``SharedKey <customer_id>:<sig>`` where sig
  = base64(HMAC-SHA256(base64-decoded shared_key,
  "POST\\n{content_length}\\napplication/json\\nx-ms-date:{date}\\n
  /api/logs")) (azure_conf.c:72-88 decodes the key; :232-247 the
  string-to-hash; :282 the header).

The record encoding is pure Catalyst; the signature is a driver-side
helper (one per HTTP POST, not per record).
"""

from __future__ import annotations

import base64
import hashlib
import hmac

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AZURE_RESOURCE = "/api/logs"
AZURE_TIME_KEY = "@timestamp"

_ISO = "yyyy-MM-dd'T'HH:mm:ss"


def to_azure_record(
    df: DataFrame,
    ts_col: str,
    tag_col: str = "tag",
    time_key: str = AZURE_TIME_KEY,
    time_generated: bool = False,
) -> Column:
    """One body-array element: {time_key: <iso-ms-Z | double>, ...rec}."""
    us = F.unix_micros(F.col(ts_col))
    if time_generated:
        tval = F.concat(
            F.date_format(F.col(ts_col), _ISO),
            F.format_string(".%03dZ", (((us % 1_000_000) - (us % 1000))
                                       / 1000).cast("long")),
        )
    else:
        tval = us / F.lit(1_000_000.0)
    return F.to_json(
        F.struct(
            tval.alias(time_key),
            *[df[c] for c in df.columns
              if c not in (ts_col, tag_col) and not c.startswith("_")],
        ),
        {"ignoreNullFields": "false"},
    )


def azure_body(records: list[str]) -> str:
    return "[" + ",".join(records) + "]"


def azure_signature(
    customer_id: str,
    shared_key_b64: str,
    content_length: int,
    rfc1123date: str,
) -> str:
    """Authorization header value for one POST."""
    key = base64.b64decode(shared_key_b64)
    str_hash = (
        f"POST\n{content_length}\napplication/json\n"
        f"x-ms-date:{rfc1123date}\n{AZURE_RESOURCE}"
    )
    sig = base64.b64encode(
        hmac.new(key, str_hash.encode(), hashlib.sha256).digest()
    ).decode()
    return f"SharedKey {customer_id}:{sig}"


def azure_headers(
    customer_id: str,
    shared_key_b64: str,
    body: str,
    rfc1123date: str,
    log_type: str = "fluentbit",
    time_generated: bool = False,
    time_key: str = AZURE_TIME_KEY,
) -> dict[str, str]:
    """The exact header set build_headers would attach."""
    headers = {
        "User-Agent": "Fluent-Bit",
        "Log-Type": log_type,
        "Content-Type": "application/json",
        "x-ms-date": rfc1123date,
        "Authorization": azure_signature(
            customer_id, shared_key_b64, len(body), rfc1123date),
    }
    if time_generated:
        headers["time-generated-field"] = time_key
    return headers


def to_kusto_record(
    df: DataFrame,
    ts_col: str,
    tag_col: str = "tag",
    time_key: str = "timestamp",
    tag_key: str = "tag",
    log_key: str = "log",
    include_time_key: bool = True,
    include_tag_key: bool = True,
) -> Column:
    """out_azure_kusto ingestion record (plugins/out_azure_kusto/
    azure_kusto.c:990-1070): ``{<time_key>: ISO8601 + 3-digit ms Z,
    <tag_key>: tag, <log_key>: <record map>}`` with the time/tag keys
    config-gated (defaults timestamp/tag/log, azure_kusto.h:48-50)."""
    us = F.unix_micros(F.col(ts_col))
    parts: list[Column] = []
    if include_time_key:
        parts.append(F.concat(
            F.date_format(F.col(ts_col), _ISO),
            F.format_string(".%03dZ", (((us % 1_000_000) - (us % 1000))
                                       / 1000).cast("long")),
        ).alias(time_key))
    if include_tag_key:
        parts.append(F.col(tag_col).alias(tag_key))
    parts.append(
        F.struct(*[df[c] for c in df.columns
                   if c not in (ts_col, tag_col)
                   and not c.startswith("_")]).alias(log_key))
    return F.to_json(F.struct(*parts), {"ignoreNullFields": "false"})
