"""cmetrics debug-text encoding, columnar.

Reference: /root/reference/lib/cmetrics/src/cmt_encode_text.c — the
format ``out_stdout`` (and the engine's debug dumps) prints for
METRICS-type events::

    2023-11-14T22:13:20.000000123Z fqname{app="api",host="h1"} = 1.5

One line per sample, RFC3339Nano UTC timestamp with exactly nine
nanosecond digits (format_metric :188-199), static labels first then
per-sample labels in one ``{k="v",...}`` group (:202-258, raw cat —
the text encoder does NO label escaping), then the value:

- scalar kinds: `` = %.17g`` (append_metric_value :164-166);
- histogram (append_histogram_metric_value :32-95):
  `` = { buckets = { <%g bound>=<count>, ..., +Inf=<count> }, sum=<%g>, count=<u64> }``
  with RAW per-bucket counts (not cumulative);
- summary (append_summary_metric_value :97-145):
  `` = { quantiles = { <%g q>=<%g v>, ... }, sum=<%g>, count=<u64> }``.

Input rows use the parse_otlp_metrics_df long-row model shared with
cmt_influx_lines / cmt_splunk_hec_events / cmt_emf_events: ``name``
is the cmetrics fqname, ``tags`` an array<struct<key,value>>,
``bucket_counts`` has len(explicit_bounds)+1 entries (the +Inf
bucket last).  The whole encoder is one Catalyst projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .influx_out import _render_g
from .prom_out import _render_value


def _ts_rfc3339nano() -> Column:
    """cmt_time_from_ns + gmtime + ``%Y-%m-%dT%H:%M:%S.%09luZ`` over
    the ``ts`` column (format_metric :188-199).  Integer division
    (`div`) keeps ts > 2^53 exact — a double detour would round the
    seconds at the truncation boundary (the hec_out precedent); the
    session timezone is UTC so date_format is gmtime."""
    sec = F.expr("ts div 1000000000")
    nsec = (F.col("ts") % F.lit(1_000_000_000)).cast("long")
    return F.concat(
        F.date_format(F.timestamp_seconds(sec), "yyyy-MM-dd'T'HH:mm:ss."),
        F.lpad(nsec.cast("string"), 9, "0"),
        F.lit("Z "),
    )


def cmt_text_lines(
    df: DataFrame,
    static_labels: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """cmetrics -> debug text lines (cmt_encode_text_create), one
    ``line`` per sample row.  Label group semantics kept from the C
    (format_metric :202-258): ``{`` opens with the first static
    label, per-sample labels join the SAME group after a comma, and
    the group closes only when at least one label of either kind
    exists; keys and values are concatenated raw (no escaping)."""
    tags_col = F.col("tags") if "tags" in df.columns else F.array()
    static = static_labels or []
    static_str = ",".join(f'{k}="{v}"' for k, v in static)

    tag_str = F.array_join(
        F.transform(
            tags_col,
            lambda t: F.concat(
                t["key"], F.lit('="'), t["value"], F.lit('"')
            ),
        ),
        ",",
    )
    has_tags = F.size(tags_col) > 0
    if static:
        label_group = F.concat(
            F.lit("{" + static_str),
            F.when(has_tags, F.concat(F.lit(","), tag_str))
            .otherwise(F.lit("")),
            F.lit("}"),
        )
    else:
        label_group = F.when(
            has_tags, F.concat(F.lit("{"), tag_str, F.lit("}"))
        ).otherwise(F.lit(""))

    bounds = F.col("explicit_bounds")
    counts = F.col("bucket_counts")
    n_bounds = F.size(bounds)
    finite = F.zip_with(
        bounds,
        F.slice(counts, 1, F.greatest(n_bounds, F.lit(1))),
        lambda b, c: F.concat(_render_g(b), F.lit("="),
                              c.cast("string")),
    )
    hist_val = F.concat(
        F.lit(" = { buckets = { "),
        F.when(
            n_bounds > 0,
            F.concat(F.array_join(finite, ", "), F.lit(", ")),
        ).otherwise(F.lit("")),
        F.lit("+Inf="),
        F.element_at(counts, -1).cast("string"),
        F.lit(" }, sum="),
        _render_g(F.col("hist_sum")),
        F.lit(", count="),
        F.col("hist_count").cast("string"),
        F.lit(" }"),
    )
    empty_d = F.array().cast("array<double>")
    q_pairs = F.zip_with(
        F.coalesce(F.col("quantiles"), empty_d),
        F.coalesce(F.col("quantile_values"), empty_d),
        lambda q, v: F.concat(_render_g(q), F.lit("="), _render_g(v)),
    )
    # zero quantiles: the C loop body never runs, leaving exactly one
    # space between the braces (append_summary_metric_value :107,128)
    summ_val = F.concat(
        F.lit(" = { quantiles = { "),
        F.when(
            F.size(q_pairs) > 0,
            F.concat(F.array_join(q_pairs, ", "), F.lit(" ")),
        ).otherwise(F.lit("")),
        F.lit("}, sum="),
        _render_g(F.col("sum_sum")),
        F.lit(", count="),
        F.col("sum_count").cast("string"),
        F.lit(" }"),
    )
    scalar_val = F.concat(F.lit(" = "), _render_value(F.col("value")))

    value = (
        F.when(F.col("mtype") == "histogram", hist_val)
        .when(F.col("mtype") == "summary", summ_val)
        .otherwise(scalar_val)
    )
    line = F.concat(
        _ts_rfc3339nano(),
        F.col("name"),
        label_group,
        value,
    )
    return df.withColumn("line", line)


# --------------------------------------------------------------------------
# ctraces debug-text encoding (the TRACES event path of out_stdout)
# Reference: /root/reference/lib/ctraces/src/ctr_encode_text.c
# --------------------------------------------------------------------------

_TRACE_ID_DEFAULT = "000000F1BI700000000000F1BI700000"  # ctr_id.h:27
_SPAN_ID_DEFAULT = "000000F1BI700000"                   # ctr_id.h:28

_KIND_NAMES = {1: "internal", 2: "server", 3: "client",
               4: "producer", 5: "consumer"}            # ctr_span.c:182


def _variant(a: Column) -> Column:
    """cfl_variant scalar rendering (format_string/int64/double/bool,
    ctr_encode_text.c:30-62): strings single-quoted, ints bare,
    doubles %.17g, bools true/false.  One nullable field per type in
    the attr struct mirrors the C's variant dispatch; nested
    array/kvlist variants are out of the span-row model (as in the
    engine's OTLP traces decode, which keeps scalar attrs only)."""
    return F.coalesce(
        F.when(a["s"].isNotNull(),
               F.concat(F.lit("'"), a["s"], F.lit("'"))),
        F.when(a["b"].isNotNull(),
               F.when(a["b"], F.lit("true")).otherwise(F.lit("false"))),
        F.when(a["i"].isNotNull(), a["i"].cast("string")),
        F.when(a["d"].isNotNull(), _render_value(a["d"])),
    )


def _attr_lines(attrs: Column, level: int) -> Column:
    """format_attributes (ctr_encode_text.c:105-146): leading
    newline, then ``- key: value`` per pair at level+4 spaces, each
    newline-terminated."""
    pad = " " * (level + 4)
    return F.concat(
        F.lit("\n"),
        F.array_join(
            F.transform(
                attrs,
                lambda a: F.concat(
                    F.lit(pad + "- "), a["key"], F.lit(": "),
                    _variant(a), F.lit("\n"),
                ),
            ),
            "",
        ),
    )


def _span_kind_line(kind: Column) -> Column:
    k = kind.cast("int")
    name = F.lit("unspecified")
    for v, s in _KIND_NAMES.items():
        name = F.when(k == v, F.lit(s)).otherwise(name)
    return F.concat(
        F.lit("             - kind                    : "),
        k.cast("string"), F.lit(" ("), name, F.lit(")\n"),
    )


def _event_blocks(events: Column, with_attrs: bool = False) -> Column:
    """format_event (ctr_encode_text.c:148-177) at span level
    (min=13): leading newline, name at 17, fields at 21; event
    attributes (when the struct carries an ``attrs`` array) render
    as a block at 25, otherwise ``none`` (ctr_attributes_count
    check :166-175)."""

    def attrs_tail(ev):
        if not with_attrs:
            return F.lit("\n                     - attributes: none\n")
        return F.when(
            F.size(F.coalesce(ev["attrs"], F.array())) > 0,
            F.concat(F.lit("\n                     - attributes:"),
                     _attr_lines(ev["attrs"], 21)),
        ).otherwise(
            F.lit("\n                     - attributes: none\n"))

    return F.array_join(
        F.transform(
            events,
            lambda ev: F.concat(
                F.lit("\n                 - name: "), ev["name"],
                F.lit("\n                     - timestamp          "
                      "     : "),
                ev["ts"].cast("string"),
                F.lit("\n                     "
                      "- dropped_attributes_count: "),
                ev["dropped"].cast("string"),
                attrs_tail(ev),
            ),
        ),
        "",
    )


def _link_blocks(links: Column) -> Column:
    """Span link entries (format_span link loop): ``- link:`` at 17,
    fields at 21 — ids fall back to the F1BI7 defaults, a NULL
    trace_state prints the glibc ``(null)``, and the dropped counter
    line is labeled ``dropped_events_count`` while printing the
    link's dropped_ATTR_count (reference mislabel kept). Link
    attributes render at 25 or ``none`` when the attr list is
    NULL."""
    pad = "                     "  # 21

    def one(lk):
        attrs = F.when(
            lk["attrs"].isNotNull(),
            F.concat(F.lit("\n" + pad + "- attributes           : "),
                     _attr_lines(lk["attrs"], 21)),
        ).otherwise(
            F.lit("\n" + pad + "- attributes           : none\n"))
        return F.concat(
            F.lit("                 - link:\n" + pad
                  + "- trace_id             : "),
            F.coalesce(lk["trace_id_hex"], F.lit(_TRACE_ID_DEFAULT)),
            F.lit("\n" + pad + "- span_id              : "),
            F.coalesce(lk["span_id_hex"], F.lit(_SPAN_ID_DEFAULT)),
            F.lit("\n" + pad + "- trace_state          : "),
            F.coalesce(lk["trace_state"], F.lit("(null)")),
            F.lit("\n" + pad + "- dropped_events_count : "),
            lk["dropped"].cast("string"),
            attrs,
        )

    return F.array_join(F.transform(links, one), "")


def ctr_text_blocks(
    df: DataFrame,
    group_cols: list[str],
    resource_attrs: Column | None = None,
    scope_name: Column | str = "",
    scope_version: Column | str = "",
    order_col: str = "span_order",
    resource_dropped: Column | int = 0,
    resource_schema_url: Column | str | None = None,
    scope_dropped: Column | int = 0,
    scope_attrs: Column | None = None,
    scope_schema_url: Column | str | None = None,
    links_col: str | None = None,
    span_schema_url_col: str | None = None,
    events_have_attrs: bool = False,
) -> DataFrame:
    """ctraces -> debug text (ctr_encode_text_create), the TRACES
    event path of out_stdout: one RESOURCE SPAN block per group with
    resource attributes, one scope_span (name/version, attributes
    ``undefined`` — the common decode shape), and every span of the
    group in ``order_col`` order as ``[span #i 'name']`` sections.

    Span rows carry: name, trace_id_hex/span_id_hex (null -> the
    F1BI7 default ids, ctr_id.h:27-28), parent_span_id_hex (null ->
    ``undefined``), kind (out-of-range ints keep the raw number with
    ``(unspecified)``), start_nanos/end_nanos, dropped_attr/
    dropped_events/dropped_links, trace_state (raw %s), status_code
    + optional status_message (quoted, line only when set), attrs
    (typed variant structs key/s/i/d/b), events (name/ts/dropped).
    Links entries are not modeled (the ``[links]`` header is still
    emitted, as the C always does); schema_url lines render the
    unset ``\"\"`` form.  The whole encoder is a Catalyst projection
    plus ONE grouping exchange (sorted collect_list per group)."""
    min_pad = "             "  # 13 = 1 + 2*4 + 4 (format_span level=2)
    trace_id = F.coalesce(F.col("trace_id_hex"),
                          F.lit(_TRACE_ID_DEFAULT))
    span_id = F.coalesce(F.col("span_id_hex"), F.lit(_SPAN_ID_DEFAULT))
    parent = F.coalesce(F.col("parent_span_id_hex"), F.lit("undefined"))

    status = F.concat(
        F.lit(min_pad + "- status:\n"),
        F.lit(min_pad + "    - code    : "),
        F.col("status_code").cast("int").cast("string"), F.lit("\n"),
        F.when(
            F.col("status_message").isNotNull(),
            F.concat(F.lit(min_pad + "    - message : '"),
                     F.col("status_message"), F.lit("'\n")),
        ).otherwise(F.lit("")),
    )
    attrs_part = F.when(
        F.size(F.col("attrs")) > 0,
        F.concat(F.lit(min_pad + "- attributes: "),
                 _attr_lines(F.col("attrs"), 13)),
    ).otherwise(F.lit(min_pad + "- attributes: none\n"))
    events_part = F.when(
        F.size(F.col("events")) > 0,
        F.concat(F.lit(min_pad + "- events: "),
                 _event_blocks(F.col("events"), events_have_attrs)),
    ).otherwise(F.lit(min_pad + "- events: none\n"))

    body = F.concat(
        F.lit(min_pad + "- trace_id                : "), trace_id,
        F.lit("\n" + min_pad + "- span_id                 : "), span_id,
        F.lit("\n" + min_pad + "- parent_span_id          : "), parent,
        F.lit("\n"),
        _span_kind_line(F.col("kind")),
        F.lit(min_pad + "- start_time              : "),
        F.col("start_nanos").cast("string"),
        F.lit("\n" + min_pad + "- end_time                : "),
        F.col("end_nanos").cast("string"),
        F.lit("\n" + min_pad + "- dropped_attributes_count: "),
        F.col("dropped_attr").cast("string"),
        F.lit("\n" + min_pad + "- dropped_events_count    : "),
        F.col("dropped_events").cast("string"),
        F.lit("\n" + min_pad + "- dropped_links_count     : "),
        F.col("dropped_links").cast("string"),
        F.lit("\n" + min_pad + "- trace_state             : "),
        # glibc printf renders a NULL %s as "(null)" — the C passes
        # span->trace_state unchecked (format_span :252)
        F.coalesce(F.col("trace_state"), F.lit("(null)")),
        F.lit("\n"),
        (F.when(F.col(span_schema_url_col).isNotNull(), F.concat(
            F.lit(min_pad + "- schema_url              : "),
            F.col(span_schema_url_col), F.lit("\n"),
        )).otherwise(F.lit("")) if span_schema_url_col
         else F.lit("")),
        status,
        attrs_part,
        events_part,
        F.lit(min_pad + "- [links]\n"),
        (_link_blocks(F.col(links_col)) if links_col
         else F.lit("")),
    )
    rows = df.withColumn("_ctr_body", body)

    res_dropped = (F.lit(resource_dropped)
                   if isinstance(resource_dropped, int)
                   else resource_dropped)
    if resource_attrs is not None:
        res_block = F.concat(
            F.lit("  resource:\n     - attributes:"),
            _attr_lines(resource_attrs, 8),
            F.lit("     - dropped_attributes_count: "),
            res_dropped.cast("string"), F.lit("\n"),
        )
    else:
        res_block = F.lit("  resource: {}\n")
    if resource_schema_url is None:
        res_url = F.lit('""')
    elif isinstance(resource_schema_url, str):
        res_url = F.lit(resource_schema_url)
    else:
        res_url = F.coalesce(resource_schema_url, F.lit('""'))
    res_block = F.concat(res_block, F.lit("     - schema_url: "),
                         res_url, F.lit("\n"))
    sname = F.lit(scope_name) if isinstance(scope_name, str) \
        else scope_name
    sver = F.lit(scope_version) if isinstance(scope_version, str) \
        else scope_version
    sdrop = (F.lit(scope_dropped) if isinstance(scope_dropped, int)
             else scope_dropped)
    if scope_attrs is not None:
        sattrs = F.concat(F.lit("        - attributes:"),
                          _attr_lines(scope_attrs, 8))
    else:
        sattrs = F.lit("        - attributes: undefined\n")
    if scope_schema_url is None:
        surl = F.lit('""')
    elif isinstance(scope_schema_url, str):
        surl = F.lit(scope_schema_url)
    else:
        surl = F.coalesce(scope_schema_url, F.lit('""'))
    scope_block = F.concat(
        F.lit("  [scope_span]\n    instrumentation scope:\n"
              "        - name                    : "), sname,
        F.lit("\n        - version                 : "), sver,
        F.lit("\n        - dropped_attributes_count: "),
        sdrop.cast("string"), F.lit("\n"),
        sattrs,
        F.lit("    schema_url: "), surl, F.lit("\n    [spans]\n"),
    )
    rows = rows.withColumn("_ctr_res", res_block) \
               .withColumn("_ctr_scope", scope_block)

    spans = F.array_sort(F.collect_list(F.struct(
        F.col(order_col).alias("ord"),
        F.col("name").alias("name"),
        F.col("_ctr_body").alias("body"),
    )))
    agg = rows.groupBy(*group_cols).agg(
        spans.alias("_spans"),
        F.first("_ctr_res").alias("_res"),
        F.first("_ctr_scope").alias("_scope"),
    )
    span_texts = F.array_join(
        F.transform(
            F.col("_spans"),
            lambda s, i: F.concat(
                F.lit("         [span #"), i.cast("string"),
                F.lit(" '"), s["name"], F.lit("']\n"), s["body"],
            ),
        ),
        "",
    )
    text = F.concat(
        F.lit("|-------------------- RESOURCE SPAN "
              "--------------------|\n"),
        F.col("_res"), F.col("_scope"), span_texts,
    )
    return agg.select(*group_cols, text.alias("text"))
