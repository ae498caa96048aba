"""out_es / out_opensearch: Elasticsearch Bulk API encoding.

Reference: /root/reference/plugins/out_es/es.c + es_bulk.h — per
record a header line ``{"<action>":{"_index":"<idx>"[, "_type":...]
[,"_id":"<id>"]}}`` (ES_BULK_INDEX_FMT* , es_bulk.h:27-30) and a body
line: the record map with ``time_key`` (default @timestamp,
strftime'd in UTC + millisecond suffix, es.c:436-455) injected first
and optionally the tag under ``tag_key``; ``logstash_format`` derives
the index as prefix + separator + strftime(logstash_dateformat) over
the RECORD's own timestamp (es.c:460-475), ``logstash_prefix_key``
takes the prefix from the record with the static prefix as fallback;
``index`` itself is strftime-expanded otherwise (es.c:487).
``write_operation`` update/upsert wraps the body as ``{"doc":...}`` /
``{"doc_as_upsert":true,"doc":...}`` (es.c:570-580). ``replace_dots``
rewrites '.' in key names to '_' (es.c:129). ``id_key`` pulls _id
from the record.

``generate_id`` deviation (documented): the reference MurmurHash3s
the record's msgpack bytes (es.c:517); msgpack framing doesn't exist
here, so the id is the xxhash64 of the body JSON — equally
deterministic and collision-resistant, but NOT byte-equal to the C
ids. Everything else is byte-parity.

Scale shape: one row per record with (index_line, doc_line) — the
bulk payload is ``concat(index_line, '\\n', doc_line, '\\n')`` per
record and raw concatenation across records, so any text sink or a
foreachBatch HTTP poster can assemble chunks without driver-side
buffering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# strftime -> Spark datetime pattern for the formats the plugin
# defaults use; extend as needed
_STRFTIME = {
    "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH",
    "%M": "mm", "%S": "ss", "%j": "DDD", "%G": "YYYY", "%V": "ww",
}


def strftime_to_spark(fmt: str) -> str:
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            if tok not in _STRFTIME:
                raise ValueError(f"unsupported strftime token {tok!r}")
            out.append(_STRFTIME[tok])
            i += 2
        elif fmt[i].isalpha():
            # one quoted run per literal stretch — per-char quoting
            # ('l''o''g') would render '' as literal quotes
            j = i
            while j < len(fmt) and fmt[j].isalpha():
                j += 1
            out.append(f"'{fmt[i:j]}'")
            i = j
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


def _c(df: DataFrame, name: str) -> Column:
    """Column by literal name (backtick dotted names — both F.col and
    df[name] would otherwise resolve '.' as struct access)."""
    return df["`" + name + "`"] if "." in name else df[name]


def to_es_bulk(
    df: DataFrame,
    ts_col: str,
    index: str = "fluent-bit",
    es_type: str = "_doc",
    suppress_type_name: bool = False,
    logstash_format: bool = False,
    logstash_prefix: str = "logstash",
    logstash_prefix_key: str | None = None,
    logstash_prefix_separator: str = "-",
    logstash_dateformat: str = "%Y.%m.%d",
    time_key: str = "@timestamp",
    time_key_format: str = "%Y-%m-%dT%H:%M:%S",
    time_key_nanos: bool = False,
    include_tag_key: bool = False,
    tag_key: str = "_flb-key",
    tag_col: str = "tag",
    id_key: str | None = None,
    generate_id: bool = False,
    write_operation: str = "create",
    replace_dots: bool = False,
    doc_cols: list[str] | None = None,
) -> DataFrame:
    """Append ``index_line`` and ``doc_line`` columns (the two Bulk
    API lines per record)."""
    ts = F.col(ts_col)
    cols = doc_cols or [
        c for c in df.columns if c not in (ts_col, tag_col)
    ]

    # body: time_key first, optional tag, then the record fields
    # (es.c:444-455: strftime + ".%03dZ" millis / ".%09dZ" nanos)
    frac = (
        F.format_string(".%09dZ", (F.unix_micros(ts) % 1_000_000) * 1000)
        if time_key_nanos
        else F.format_string(
            ".%03dZ", ((F.unix_micros(ts) % 1_000_000) / 1000).cast("long")
        )
    )
    time_val = F.concat(
        F.date_format(ts, strftime_to_spark(time_key_format)), frac
    )
    fields: list[Column] = [time_val.alias(time_key)]
    if include_tag_key:
        fields.append(F.col(tag_col).alias(tag_key))
    for c in cols:
        name = c.replace(".", "_") if replace_dots else c
        fields.append(_c(df, c).alias(name))
    body = F.to_json(F.struct(*fields), {"ignoreNullFields": "false"})

    op = write_operation.lower()
    if op in ("update", "upsert"):
        wrap = (
            '{"doc_as_upsert":true,"doc":' if op == "upsert" else '{"doc":'
        )
        body = F.concat(F.lit(wrap), body, F.lit("}"))
        action = op if op == "update" else "update"
    else:
        action = op  # create (default) or index

    # index name
    if logstash_format:
        prefix = F.lit(logstash_prefix)
        if logstash_prefix_key and logstash_prefix_key in df.columns:
            prefix = F.coalesce(
                _c(df, logstash_prefix_key).cast("string"), prefix
            )
        idx = F.concat(
            prefix,
            F.lit(logstash_prefix_separator),
            F.date_format(ts, strftime_to_spark(logstash_dateformat)),
        )
    elif "%" in index:
        idx = F.date_format(ts, strftime_to_spark(index))
    else:
        idx = F.lit(index)

    # _id: id_key from the record, or generated (see module docstring)
    rid = None
    if id_key and id_key in df.columns:
        rid = _c(df, id_key).cast("string")
    elif generate_id:
        rid = F.lower(F.hex(F.xxhash64(body)))

    head = F.concat(F.lit('{"' + action + '":{"_index":"'), idx, F.lit('"'))
    if not suppress_type_name:
        head = F.concat(head, F.lit(f',"_type":"{es_type}"'))
    if rid is not None:
        maybe_id = F.when(
            rid.isNotNull(), F.concat(F.lit(',"_id":"'), rid, F.lit('"'))
        ).otherwise(F.lit(""))
        head = F.concat(head, maybe_id)
    head = F.concat(head, F.lit("}}"))

    return df.withColumn("index_line", head).withColumn("doc_line", body)


def es_bulk_lines(encoded: DataFrame) -> DataFrame:
    """One ``line`` per record holding both bulk lines — raw
    concatenation across records is a valid _bulk payload."""
    return encoded.select(
        F.concat("index_line", F.lit("\n"), "doc_line").alias("line")
    )
