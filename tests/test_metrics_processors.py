"""processor_labels / processor_metrics_selector semantics.

Reference behaviors under test: labels.c:1565 (update only existing),
:1623 (insert only missing), :1685 (upsert), :1739 (delete),
:1778-1803 (hash, empty value untouched), :1871-1891 (op order);
selector.c:120-148 (prefix/substring/regex include/exclude),
cmt_filter.c:252-302 (delete_label_value keeps series lacking key).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fluent_bit_spark.operators.metrics_processors import (
    apply_labels,
    labels_str,
    select_metrics,
)


def _metrics(spark):
    rows = [
        ("fb_in_records", {"host": "a", "svc": "web"}, 1.0, "app.x"),
        ("fb_out_records", {"host": "b", "svc": ""}, 2.0, "app.y"),
        ("node_cpu_total", {"svc": "db"}, 3.0, "sys.z"),
    ]
    return spark.createDataFrame(
        rows, "metric_name string, labels map<string,string>, value double, tag string"
    )


def _by_name(df):
    out = df.select("metric_name", labels_str().alias("ls")).collect()
    return {r.metric_name: r.ls for r in out}


def test_update_only_existing(spark):
    got = _by_name(apply_labels(_metrics(spark), update=[("host", "H")]))
    assert got["fb_in_records"] == "host=H,svc=web"
    assert got["node_cpu_total"] == "svc=db"  # no host key: untouched


def test_insert_only_missing(spark):
    got = _by_name(apply_labels(_metrics(spark), insert=[("host", "H")]))
    assert got["fb_in_records"] == "host=a,svc=web"  # present: kept
    assert got["node_cpu_total"] == "host=H,svc=db"  # absent: added


def test_upsert_both_paths(spark):
    got = _by_name(apply_labels(_metrics(spark), upsert=[("host", "H")]))
    assert got["fb_in_records"] == "host=H,svc=web"
    assert got["node_cpu_total"] == "host=H,svc=db"


def test_delete_then_insert_order(spark):
    # delete runs before insert (labels.c:1871-1891), so a deleted
    # key can be re-added with the new value.
    got = _by_name(
        apply_labels(_metrics(spark), delete=["svc"], insert=[("svc", "new")])
    )
    assert got["fb_in_records"] == "host=a,svc=new"


def test_hash_sha256_and_empty_untouched(spark):
    got = _by_name(apply_labels(_metrics(spark), hash_keys=["svc"]))
    assert got["fb_in_records"] == "host=a,svc=" + hashlib.sha256(b"web").hexdigest()
    # empty value: hash_transformer returns without transforming
    assert got["fb_out_records"] == "host=b,svc="


def test_tag_accessor_value(spark):
    got = _by_name(
        apply_labels(_metrics(spark), upsert=[("tag", "$TAG")], tag_col="tag")
    )
    assert got["fb_in_records"] == "host=a,svc=web,tag=app.x"


def test_selector_prefix_include_exclude(spark):
    m = _metrics(spark)
    inc = select_metrics(m, metric_name="fb_")
    assert {r.metric_name for r in inc.collect()} == {"fb_in_records", "fb_out_records"}
    exc = select_metrics(m, metric_name="fb_", action="exclude")
    assert {r.metric_name for r in exc.collect()} == {"node_cpu_total"}


def test_selector_substring_and_regex(spark):
    m = _metrics(spark)
    sub = select_metrics(m, metric_name="_records", operation_type="substring")
    assert sub.count() == 2
    rex = select_metrics(m, metric_name="/cpu|out/")
    assert {r.metric_name for r in rex.collect()} == {
        "fb_out_records",
        "node_cpu_total",
    }


def test_selector_delete_label_value(spark):
    m = _metrics(spark)
    out = select_metrics(m, context="delete_label_value", label="host a")
    # host=a dropped; host=b and the row WITHOUT a host key are kept
    assert {r.metric_name for r in out.collect()} == {
        "fb_out_records",
        "node_cpu_total",
    }


def test_labels_plan_is_narrow(spark):
    # the whole label pipeline is projection-only: no exchange
    out = apply_labels(
        _metrics(spark),
        delete=["host"],
        update=[("svc", "S")],
        upsert=[("env", "prod")],
        hash_keys=["svc"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_labels_many_rules_linear_plan(spark):
    """15 chained upsert/insert rules must not blow up the expression
    tree (~3^k without the projection barrier); construction + plan
    analysis completes instantly and semantics hold."""
    import time

    from fluent_bit_spark.operators.metrics_processors import apply_labels

    df = spark.createDataFrame(
        [("m", {"l0": "v0"})], "metric_name string, labels map<string,string>"
    )
    ups = [(f"k{i}", f"v{i}") for i in range(8)]
    ins = [(f"j{i}", f"w{i}") for i in range(7)]
    t0 = time.perf_counter()
    out = apply_labels(df, upsert=ups, insert=ins)
    row = out.collect()[0]
    elapsed = time.perf_counter() - t0
    assert elapsed < 30  # 3^15 trees hang for minutes / OOM
    labels = row["labels"]
    assert labels["l0"] == "v0"
    assert all(labels[f"k{i}"] == f"v{i}" for i in range(8))
    assert all(labels[f"j{i}"] == f"w{i}" for i in range(7))
