"""out_loki payload encoding: stream labels, entry pairs, line formats.

Reference: /root/reference/plugins/out_loki/loki.c — pack_labels
(:536) builds the stream label set from the ``labels`` config (static
k=v or record-accessor values, pack_kv :355), ``label_keys`` and the
default ``{"job":"fluent-bit"}``; label names are sanitized by
pack_label_key (:315: non-alphanumeric -> '_', leading digit gets a
'_' prefix); pack_record (:1372) renders the log line after
``remove_keys`` (labels' source keys are auto-removed, :245) either as
JSON (flb_msgpack_to_json, nulls kept) or ``key_value`` pairs
(pack_format_line_value :1234: strings raw-quoted WITHOUT escaping —
bug-compatible — null/true/false, ints bare, integral floats %.1f);
``drop_single_key`` collapses single-key records to the bare value
(:1419), with ``raw`` leaving strings unquoted; timestamps are
nanosecond strings (pack_timestamp :1216).

Spark shape — scale first: one row per log entry ``(stream, ns,
line)`` where ``stream`` is the canonical label-set JSON. The HTTP
push body groups entries per stream; ``loki_push_payload`` does that
with a bounded ``max_entries`` per payload (a giant stream never
becomes one driver-side JSON string — batches split deterministically
and each payload row stays executor-sized). Everything is Catalyst;
no Python in the row path.

Float rendering deviation (documented): non-integral doubles in
key_value mode use Spark's shortest-round-trip cast, the reference
uses C ``%.16g`` — identical for values up to 16 significant digits
(every test fixture), divergent only for 17-digit doubles.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_STREAM = '{"job":"fluent-bit"}'


def loki_label_name(name: str) -> str:
    """pack_label_key sanitization (loki.c:315-352), driver-side for
    configured label names."""
    out = re.sub(r"[^A-Za-z0-9_]", "_", name)
    if out and out[0].isdigit():
        out = "_" + out
    return out


def _render_kv_value(df: DataFrame, c: str) -> Column:
    """pack_format_line_value (loki.c:1234-1313): strings raw-quoted
    (NO inner escaping — reference bug kept), null, true/false, ints
    bare, floats %.1f when integral else shortest-cast (see module
    docstring)."""
    dt = df.schema[c].dataType.simpleString()
    col = F.col(c)
    if dt == "string":
        rendered = F.concat(F.lit('"'), col, F.lit('"'))
    elif dt == "boolean":
        # two whens, not otherwise: a NULL bool must stay NULL so the
        # coalesce below renders it as 'null'
        rendered = F.when(col, F.lit("true")).when(~col, F.lit("false"))
    elif dt in ("double", "float"):
        d = col.cast("double")
        rendered = F.when(
            d == F.floor(d).cast("double"), F.format_string("%.1f", d)
        ).otherwise(d.cast("string"))
    else:
        rendered = col.cast("string")
    return F.coalesce(rendered, F.lit("null"))


def to_loki(
    df: DataFrame,
    ts_col: str,
    tag_col: str | None = None,
    labels: dict[str, str] | None = None,
    label_keys: list[str] | None = None,
    remove_keys: list[str] | None = None,
    line_format: str = "json",
    drop_single_key: bool | str = False,
) -> DataFrame:
    """One row per log entry: (stream, ns, line).

    ``labels``: {label_name: value}, where a value starting with '$'
    reads the named record column per record (empty/null values skip
    the label for that record, pack_kv loki.c:369-377) and anything
    else is a static string. ``label_keys``: record columns promoted
    to labels under their (sanitized) own name. Columns used as label
    sources are removed from the line (remove_keys_derived, :245),
    as are explicit ``remove_keys``. With no labels at all the stream
    is the default {"job":"fluent-bit"} (:580-592).
    """
    if line_format not in ("json", "key_value"):
        raise ValueError(f"invalid line_format {line_format!r}")

    entries: list[tuple[Column, Column]] = []
    derived_remove: set[str] = set(remove_keys or [])
    for name, val in (labels or {}).items():
        if val.startswith("$"):
            src = val[1:]
            derived_remove.add(src)
            vcol = df[src].cast("string") if src != "TAG" else F.col(tag_col)
        else:
            vcol = F.lit(val)
        entries.append((F.lit(loki_label_name(name)), vcol))
    for key in label_keys or []:
        derived_remove.add(key)
        entries.append((F.lit(loki_label_name(key)), F.col(key).cast("string")))

    if entries:
        lmap = F.map_filter(
            F.map_from_arrays(
                F.array(*[k for k, _ in entries]),
                F.array(*[v for _, v in entries]),
            ),
            lambda k, v: v.isNotNull() & (v != ""),
        )
        stream = F.when(
            F.size(F.map_keys(lmap)) > 0, F.to_json(lmap)
        ).otherwise(F.lit(DEFAULT_STREAM))
    else:
        stream = F.lit(DEFAULT_STREAM)

    reserved = {ts_col, tag_col} | derived_remove
    line_cols = [c for c in df.columns if c not in reserved]

    if drop_single_key and len(line_cols) == 1:
        c = line_cols[0]
        is_str = df.schema[c].dataType.simpleString() == "string"
        if line_format == "key_value":
            # KV + single key: strings raw, other types rendered
            # (loki.c:1436-1454)
            line = F.col(c) if is_str else _render_kv_value(df, c)
        elif drop_single_key == "raw" and is_str:
            # 'raw': the bare string, unquoted (loki.c:1420-1431)
            line = F.col(c)
        else:
            # bare JSON rendering of the single value: strip the
            # '{"v":' wrapper (5 chars) and trailing '}' from to_json
            j = F.to_json(
                F.struct(F.col(c).alias("v")), {"ignoreNullFields": "false"}
            )
            line = j.substr(F.lit(6), F.length(j) - 6)
    elif line_format == "json":
        line = F.to_json(
            F.struct(*[F.col(c) for c in line_cols]),
            {"ignoreNullFields": "false"},
        )
    else:
        parts = []
        for i, c in enumerate(line_cols):
            sep = F.lit("") if i == 0 else F.lit(" ")
            parts.append(
                F.concat(sep, F.lit(c), F.lit("="), _render_kv_value(df, c))
            )
        line = F.concat(*parts)

    ns = (F.unix_micros(F.col(ts_col)) * 1000).cast("string")
    return df.select(
        stream.alias("stream"), ns.alias("ns"), line.alias("line")
    )


def loki_push_payload(
    entries: DataFrame, max_entries: int = 10_000
) -> DataFrame:
    """Group entries into Loki push API bodies: one row per
    (stream, batch) with a ``payload`` JSON string
    ``{"streams":[{"stream":{...},"values":[[ns,line],...]}]}``.

    ``max_entries`` bounds payload size (the HTTP flush analog): a
    stream with N entries produces ceil(N/max_entries) payload rows,
    each values-sorted by timestamp. The sort + batch split is one
    window pass; payload assembly is array_agg over (stream, batch) —
    no driver collection.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("stream").orderBy("ns", "line")
    batched = entries.withColumn(
        "_batch", ((F.row_number().over(w) - 1) / max_entries).cast("long")
    )
    grouped = batched.groupBy("stream", "_batch").agg(
        F.sort_array(F.collect_list(F.struct("ns", "line"))).alias("vs")
    )
    values = F.transform("vs", lambda e: F.array(e["ns"], e["line"]))
    payload = F.concat(
        F.lit('{"streams":[{"stream":'),
        F.col("stream"),
        F.lit(',"values":'),
        F.to_json(values),
        F.lit("}]}"),
    )
    return grouped.select(
        "stream", F.col("_batch").alias("batch"), payload.alias("payload")
    )
