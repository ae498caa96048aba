"""processor_labels + processor_metrics_selector over a metrics table.

The reference's metrics pipeline processors operate on a cmetrics
(`cmt`) context — a set of metric series, each with an fqname and a
label set.  The Spark-native shape is one ROW PER SERIES:

    metric_name: string, labels: map<string,string>, value: double

(the natural output of ``operators/log_to_metrics.py`` once the label
columns are packed into a map).  Static vs dynamic labels — a cmt
distinction between context-wide and per-series labels
(`plugins/processor_labels/labels.c:480-578` vs `:1114-1467`) —
collapse into the one map column: every series row carries its full
label set, which is exactly what the reference's paired
static+dynamic handling converges to per series.

processor_labels — reference `plugins/processor_labels/labels.c`:
  - operation order delete -> update -> upsert -> insert -> hash is
    the reference's callback order (`labels.c:1871-1891`).
  - update touches only series that already HAVE the key
    (`labels.c:1565`), insert only series that DON'T
    (`labels.c:1623`), upsert always wins (`labels.c:1685`),
    delete removes the pair (`labels.c:1739`), hash replaces the
    value with lowercase-hex sha256, leaving empty values untouched
    (`labels.c:1778-1803` hash_transformer).
  - label VALUES may reference the record accessor (`labels.c` uses
    flb_record_accessor for values containing '$'); we support the
    `$TAG` form against an optional tag column.

processor_metrics_selector — reference
`plugins/processor_metrics_selector/selector.c`:
  - context metric_name: include/exclude series whose fqname matches
    by prefix (default), substring, or regex when the pattern is
    wrapped in slashes (`selector.c:120-148`); regex is a SEARCH
    (flb_regex_match), matching Java's RLIKE semantics.
  - context delete_label_value: drop series whose labels[key] equals
    the given value (`selector.c:151-185`,
    `lib/cmetrics/src/cmt_filter.c:252-302`
    metrics_map_drop_label_value_pairs); series without the key are
    kept.

All transformations are single-pass Catalyst expressions over the map
column — no UDFs, no shuffle, safe at any scale (narrow ops compose
into the surrounding stage's WholeStageCodegen pipeline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _value_expr(value: str, tag_col: str | None) -> Column:
    """Literal label value, with the reference's record-accessor
    `$TAG` form resolved against the tag column when present."""
    if value == "$TAG" and tag_col is not None:
        return F.col(tag_col)
    return F.lit(value)


def apply_labels(
    df: DataFrame,
    labels_col: str = "labels",
    delete: list[str] | None = None,
    update: list[tuple[str, str]] | None = None,
    upsert: list[tuple[str, str]] | None = None,
    insert: list[tuple[str, str]] | None = None,
    hash_keys: list[str] | None = None,
    tag_col: str | None = None,
) -> DataFrame:
    """processor_labels: mutate the per-series label map.

    Applies the five rule lists in the reference's fixed order
    (labels.c:1871-1891).  Within a list, rules apply in config
    order, matching FLB_CONFIG_MAP_MULT iteration.

    Upsert/insert rules reference the accumulated map three times
    (contains-check, rewrite, concat), so each one is flushed through
    a projection barrier — the expression tree stays LINEAR in the
    rule count instead of growing ~3^k (the optimizer does not
    re-inline non-cheap expressions referenced more than once).
    """
    out = df
    labels = F.col(labels_col)

    def _barrier() -> Column:
        nonlocal out
        out = out.withColumn(labels_col, labels)
        return F.col(labels_col)

    def _not_key(k: Column):
        return lambda mk, mv: mk != k

    def _set_if_key(k: Column, v: Column):
        return lambda mk, mv: F.when(mk == k, v).otherwise(mv)

    def _hash_if_key(k: Column):
        return lambda mk, mv: F.when(
            (mk == k) & mv.isNotNull() & (F.length(mv) > 0),
            F.lower(F.sha2(mv, 256)),
        ).otherwise(mv)

    for key in delete or []:
        labels = F.map_filter(labels, _not_key(F.lit(key)))

    for key, value in update or []:
        k, v = F.lit(key), _value_expr(value, tag_col)
        labels = F.transform_values(labels, _set_if_key(k, v))

    for key, value in upsert or []:
        k, v = F.lit(key), _value_expr(value, tag_col)
        updated = F.transform_values(labels, _set_if_key(k, v))
        labels = F.when(F.map_contains_key(labels, k), updated).otherwise(
            F.map_concat(labels, F.create_map(k, v))
        )
        labels = _barrier()

    for key, value in insert or []:
        k, v = F.lit(key), _value_expr(value, tag_col)
        labels = F.when(F.map_contains_key(labels, k), labels).otherwise(
            F.map_concat(labels, F.create_map(k, v))
        )
        labels = _barrier()

    for key in hash_keys or []:
        labels = F.transform_values(labels, _hash_if_key(F.lit(key)))

    return out.withColumn(labels_col, labels)


def select_metrics(
    df: DataFrame,
    metric_name: str | None = None,
    action: str = "include",
    operation_type: str = "prefix",
    context: str = "metric_name",
    label: str | None = None,
    name_col: str = "metric_name",
    labels_col: str = "labels",
) -> DataFrame:
    """processor_metrics_selector: keep/drop series rows.

    context='metric_name' filters on the fqname column;
    context='delete_label_value' takes ``label="key value"`` and
    drops series carrying that exact label pair.
    """
    if context == "delete_label_value":
        if not label or len(label.split(None, 1)) != 2:
            raise ValueError("delete_label_value needs label='key value'")
        key, value = label.split(None, 1)
        pair = F.col(labels_col).getItem(key)
        # series without the key (pair IS NULL) are kept, like
        # metrics_map_drop_label_value_pairs which only walks series
        # that have the label index.
        return df.filter(~pair.eqNullSafe(F.lit(value)))

    if context != "metric_name":
        raise ValueError(f"unknown context {context!r}")
    if metric_name is None:
        raise ValueError("metric_name is needed for selector")

    name = F.col(name_col)
    if len(metric_name) >= 2 and metric_name.startswith("/") and metric_name.endswith("/"):
        matches = name.rlike(metric_name[1:-1])
    elif operation_type == "prefix":
        matches = name.startswith(metric_name)
    elif operation_type == "substring":
        matches = name.contains(metric_name)
    else:
        raise ValueError(f"unknown operation_type {operation_type!r}")

    if action == "include":
        return df.filter(matches)
    if action == "exclude":
        return df.filter(~matches)
    raise ValueError(f"unknown action {action!r}")


def labels_str(labels_col: str = "labels") -> Column:
    """Deterministic string form of a label map for oracle-friendly
    output: entries sorted by key, 'k=v' joined with ','."""
    return F.array_join(
        F.transform(
            F.array_sort(F.map_entries(F.col(labels_col))),
            lambda e: F.concat(e.getField("key"), F.lit("="), e.getField("value")),
        ),
        ",",
    )
