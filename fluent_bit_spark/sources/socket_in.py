"""in_tcp / in_udp / in_unix_socket / in_serial payload framing.

Reference: /root/reference/plugins/in_tcp/tcp_conn.c —
- ``format none`` (parse_payload_none :179-250): the stream splits on
  the configured ``separator`` (Raw escape sequences unescaped,
  tcp_config.c:70-82); each separator-TERMINATED chunk becomes a
  record ``{"log": <chunk>}`` (empty chunks included — only syslog
  skips empties); an unterminated tail stays buffered.
- ``format json`` (parse_payload_json :150-177 + process_pack
  :36-140): the stream is concatenated JSON roots; a map root IS the
  record, any other root type lands under ``msg``;
  ``source_address_key`` appends the peer address.

in_serial (plugins/in_serial/in_serial.c:201-240) uses the same two
shapes with record key ``msg`` for separator mode.

Framing is a split+explode projection (JVM) for separator mode and an
Arrow-batched concatenated-JSON walk for json mode.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_separated(
    df: DataFrame,
    data_col: str = "data",
    separator: str = "\n",
    key: str = "log",
) -> DataFrame:
    """format-none framing: one record per separator-terminated chunk
    (the trailing unterminated chunk is transport buffering — dropped
    from a captured replay row)."""
    parts = F.split(F.col(data_col), re.escape(separator), -1)
    # the LAST array element is the unterminated tail: slice it off
    complete = F.slice(parts, 1, F.greatest(
        F.size(parts) - 1, F.lit(0)))
    out = df.withColumn(key, F.explode(complete))
    return out.drop(*([data_col] if data_col != key else []))


def parse_json_stream(
    df: DataFrame,
    data_col: str = "data",
    msg_key: str = "msg",
    source_address_col: str | None = None,
    source_address_key: str | None = None,
) -> DataFrame:
    """format-json framing: concatenated JSON roots -> one ``record``
    JSON per root (map roots pass through, other roots nest under
    ``msg``); invalid JSON skips the payload with a warning."""
    import pandas as pd

    cols = [data_col] + (
        [source_address_col] if source_address_col else [])

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = json.JSONDecoder()
        for pdf in batches:
            recs = []
            addrs = pdf[source_address_col] if source_address_col \
                else [None] * len(pdf)
            for body, addr in zip(pdf[data_col], addrs):
                if body is None:
                    continue
                pos, n = 0, len(body)
                docs = []
                ok = True
                while pos < n:
                    while pos < n and body[pos] in " \t\r\n":
                        pos += 1
                    if pos >= n:
                        break
                    try:
                        doc, pos = dec.raw_decode(body, pos)
                    except ValueError:
                        ok = False  # invalid JSON message, skipping
                        break
                    docs.append(doc)
                if not ok:
                    continue
                for doc in docs:
                    rec = dict(doc) if isinstance(doc, dict) \
                        else {msg_key: doc}
                    if source_address_key and addr is not None:
                        rec[source_address_key] = addr
                    recs.append(json.dumps(rec, separators=(",", ":")))
            yield pd.DataFrame(
                {"record": pd.Series(recs, dtype="object")})

    return df.select(*cols).mapInPandas(walk, "record string")
