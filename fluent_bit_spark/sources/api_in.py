"""in_elasticsearch (Bulk API) + in_splunk (HEC) request-body parsing.

in_elasticsearch (reference /root/reference/plugins/in_elasticsearch/
in_elasticsearch_bulk_prot.c process_ndpack :345-560): the body is
NDJSON alternating meta/body lines. The meta line must be a one-key
map whose key is the write op:
- ``index`` / ``create``: the NEXT line becomes a record ``{<meta_key
  (default "@meta")>: <meta map>, ...body}`` and the bulk response
  collects ``{"<op>":{"status":201,"result":"created"}}``;
- ``update``: body line consumed, no record, status 403 forbidden;
- ``delete``: single-line action, no record, status 404 not_found;
- any other op: status ``{"unknown":{"status":400,"result":
  "bad_request"}}`` and the REST of the body is abandoned;
- a missing/malformed meta line stops processing.
``tag_key`` (a body-record key) overrides the routing tag per record
(:489-500).

in_splunk (plugins/in_splunk/splunk_prot.c):
- JSON endpoint (process_json_payload_pack :386-435): the payload is
  one map, an ARRAY of maps, or concatenated maps; each map is
  appended verbatim (HEC's ``time``/``event`` keys are NOT
  interpreted), tag from ``tag_key`` when configured;
- raw endpoint (process_raw_payload_pack :219-280): the WHOLE body is
  ONE record under ``log``; the ingested Authorization header is
  stored under ``store_token_key`` in the body when
  ``store_token_in_metadata`` is off.

Decoders run per request body inside Arrow batches; a replay of
captured API traffic fans records out at scan speed.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame

BULK_OPS = ("index", "create", "update", "delete")


def process_bulk(
    body: str,
    meta_key: str = "@meta",
    tag_key: str | None = None,
    tag: str | None = None,
) -> tuple[list[tuple[str | None, str]], str]:
    """One Bulk body -> ([(tag, record_json)], bulk statuses JSON)."""
    records: list[tuple[str | None, str]] = []
    statuses: list[str] = []
    lines = [ln for ln in body.split("\n") if ln.strip()]
    i = 0
    while i < len(lines):
        try:
            meta = json.loads(lines[i])
        except ValueError:
            meta = None
        # get_write_op (:311-336) takes the FIRST key of the meta map,
        # regardless of map size; an empty map / non-map is the
        # "meta information line is missing" case
        op = None
        if isinstance(meta, dict) and meta:
            op = next(iter(meta))
        if op not in BULK_OPS:
            if op is not None:
                statuses.append(
                    '{"unknown":{"status":400,"result":"bad_request"}}')
            # meta information line is missing -> stop
            break
        if op == "delete":
            statuses.append(
                '{"delete":{"status":404,"result":"not_found"}}')
            i += 1
            continue
        if i + 1 >= len(lines):
            break
        if op == "update":
            statuses.append(
                '{"update":{"status":403,"result":"forbidden"}}')
            i += 2
            continue
        try:
            doc = json.loads(lines[i + 1])
        except ValueError:
            doc = None
        if not isinstance(doc, dict):
            break  # skip record from invalid type -> abort
        rec = {meta_key: meta}
        rec.update(doc)
        rtag = tag
        if tag_key and isinstance(doc.get(tag_key), str):
            rtag = doc[tag_key]
        records.append((rtag, json.dumps(rec, separators=(",", ":"))))
        statuses.append(
            '{"%s":{"status":201,"result":"created"}}' % op)
        i += 2
    return records, "[" + ",".join(statuses) + "]"


def parse_es_bulk(
    df: DataFrame,
    body_col: str = "body",
    tag_col: str | None = None,
    meta_key: str = "@meta",
    tag_key: str | None = None,
) -> DataFrame:
    """DataFrame of Bulk request bodies -> (tag, record) rows."""
    import pandas as pd

    cols = [body_col] + ([tag_col] if tag_col else [])

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tags, recs = [], []
            base_tags = pdf[tag_col] if tag_col else [None] * len(pdf)
            for body, base_tag in zip(pdf[body_col], base_tags):
                if body is None:
                    continue
                out, _ = process_bulk(body, meta_key=meta_key,
                                      tag_key=tag_key, tag=base_tag)
                for t, r in out:
                    tags.append(t)
                    recs.append(r)
            yield pd.DataFrame(
                {"tag": pd.Series(tags, dtype="object"),
                 "record": pd.Series(recs, dtype="object")})

    return df.select(*cols).mapInPandas(walk, "tag string, record string")


def hec_json_records(
    body: str, tag_key: str | None = None, tag: str | None = None
) -> list[tuple[str | None, str]]:
    """One HEC JSON body -> [(tag, record_json)]; maps, an array of
    maps, or concatenated maps."""
    out: list[tuple[str | None, str]] = []
    dec = json.JSONDecoder()
    pos, n = 0, len(body)
    docs = []
    while pos < n:
        while pos < n and body[pos] in " \t\r\n":
            pos += 1
        if pos >= n:
            break
        try:
            doc, pos = dec.raw_decode(body, pos)
        except ValueError:
            return []  # skip record from invalid type
        if isinstance(doc, list):
            docs.extend(d for d in doc if isinstance(d, dict))
            break  # the array branch consumes the rest
        if not isinstance(doc, dict):
            return []
        docs.append(doc)
    for doc in docs:
        rtag = tag
        if tag_key and isinstance(doc.get(tag_key), str):
            rtag = doc[tag_key]
        out.append((rtag, json.dumps(doc, separators=(",", ":"))))
    return out


def parse_hec_json(
    df: DataFrame,
    body_col: str = "body",
    tag_col: str | None = None,
    tag_key: str | None = None,
) -> DataFrame:
    """DataFrame of HEC /services/collector bodies -> (tag, record)."""
    import pandas as pd

    cols = [body_col] + ([tag_col] if tag_col else [])

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tags, recs = [], []
            base_tags = pdf[tag_col] if tag_col else [None] * len(pdf)
            for body, base_tag in zip(pdf[body_col], base_tags):
                if body is None:
                    continue
                for t, r in hec_json_records(
                        body, tag_key=tag_key, tag=base_tag):
                    tags.append(t)
                    recs.append(r)
            yield pd.DataFrame(
                {"tag": pd.Series(tags, dtype="object"),
                 "record": pd.Series(recs, dtype="object")})

    return df.select(*cols).mapInPandas(walk, "tag string, record string")


def parse_hec_raw(
    df: DataFrame,
    body_col: str = "body",
    auth_col: str | None = None,
    store_token_key: str = "@splunk_token",
    store_token_in_metadata: bool = True,
) -> DataFrame:
    """HEC /services/collector/raw: the whole body is ONE record under
    ``log``; the auth header lands in the body under store_token_key
    when store_token_in_metadata is off."""
    from pyspark.sql import functions as F

    if not store_token_in_metadata and auth_col is not None:
        return df.select(
            F.col(auth_col).alias(store_token_key),
            F.col(body_col).alias("log"),
        )
    return df.select(F.col(body_col).alias("log"))


# ---------------------------------------------------------------- in_http

def http_uri_tag(uri: str) -> str | None:
    """in_http tag from the request URI (http_prot.c:870-930): strip
    the query string, drop the leading '/'; '/' alone means the
    default tag (None here); every char outside [alnum_.] rewrites to
    '_' (:924-928)."""
    qs = uri.find("?")
    if qs >= 0:
        uri = uri[:qs]
    if len(uri) <= 1:
        return None
    return "".join(
        c if (c.isalnum() or c in "_.") else "_" for c in uri[1:])


def _http_tag_key(doc: dict, tag_key: str) -> str | None:
    """tag_key lookup with the reference's prefix-compare quirk
    (http_prot.c:194 ``strncmp(tag_key, key, strlen(key))``): a record
    key that is a PREFIX of the configured tag_key matches; the first
    string-valued match wins."""
    for k, v in doc.items():
        if isinstance(k, str) and tag_key.startswith(k):
            if isinstance(v, str):
                return v
    return None


def http_json_records(
    body: str, tag_key: str | None = None, tag: str | None = None
) -> list[tuple[str | None, str]]:
    """One in_http request body -> [(tag, record_json)]
    (http_prot.c process_pack :276-360): concatenated JSON roots; a
    map root is one record; an array root emits EVERY element verbatim
    (no map check, :318-336); other roots are skipped. Tag precedence:
    tag_key value > URI tag > default."""
    out: list[tuple[str | None, str]] = []
    dec = json.JSONDecoder()
    pos, n = 0, len(body)
    while pos < n:
        while pos < n and body[pos] in " \t\r\n":
            pos += 1
        if pos >= n:
            break
        try:
            doc, pos = dec.raw_decode(body, pos)
        except ValueError:
            # FLB_ERR_JSON_PART/_INVAL skip the WHOLE body, valid
            # leading roots included (parse_payload_json :389-400)
            return []
        if isinstance(doc, dict):
            recs = [doc]
        elif isinstance(doc, list):
            recs = doc
        else:
            continue
        for rec in recs:
            rtag = None
            if tag_key and isinstance(rec, dict):
                rtag = _http_tag_key(rec, tag_key)
            out.append((
                rtag if rtag is not None else tag,
                json.dumps(rec, separators=(",", ":")),
            ))
    return out


def parse_http_json(
    df: DataFrame,
    body_col: str = "body",
    uri_col: str | None = None,
    tag_key: str | None = None,
) -> DataFrame:
    """DataFrame of in_http POST bodies -> (tag, record). The tag
    derives per request from ``uri_col`` (http_uri_tag) and per record
    from ``tag_key``."""
    import pandas as pd

    cols = [body_col] + ([uri_col] if uri_col else [])

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tags, recs = [], []
            uris = pdf[uri_col] if uri_col else [None] * len(pdf)
            for body, uri in zip(pdf[body_col], uris):
                if body is None:
                    continue
                base = http_uri_tag(uri) if uri is not None else None
                for t, r in http_json_records(
                        body, tag_key=tag_key, tag=base):
                    tags.append(t)
                    recs.append(r)
            yield pd.DataFrame(
                {"tag": pd.Series(tags, dtype="object"),
                 "record": pd.Series(recs, dtype="object")})

    return df.select(*cols).mapInPandas(walk, "tag string, record string")
