"""Broadcast-enrich tests (geoip2/checklist shapes, FIXTURES.md §4)."""

from pyspark.sql import functions as F

from fluent_bit_spark.enrich import checklist, lookup_join


def test_lookup_join_adds_fields(spark):
    facts = spark.createDataFrame(
        [("example.com", 1), ("other.org", 2), ("missing.net", 3)],
        "domain string, id long",
    )
    geo = spark.createDataFrame(
        [("example.com", "US", "NYC"), ("other.org", "DE", "Berlin")],
        "key string, country string, city string",
    )
    out = lookup_join(facts, geo, key="domain", lookup_key="key",
                      add_fields={"geo_country": "country", "geo_city": "city"})
    rows = {r["domain"]: (r["geo_country"], r["geo_city"]) for r in out.collect()}
    assert rows["example.com"] == ("US", "NYC")
    assert rows["missing.net"] == (None, None)  # left join keeps row


def test_lookup_join_is_broadcast(spark):
    facts = spark.createDataFrame([("a", 1)], "k string, id long")
    small = spark.createDataFrame([("a", "x")], "k string, v string")
    plan = lookup_join(facts, small, key="k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_checklist_list_and_df(spark):
    df = spark.createDataFrame([("bad.com",), ("good.org",)], "domain string")
    out = checklist(df, ["bad.com"], "domain", {"flagged": "true"})
    rows = {r["domain"]: r["flagged"] for r in out.collect()}
    assert rows == {"bad.com": "true", "good.org": None}

    values = spark.createDataFrame([("bad.com",)], "value string")
    out2 = checklist(df, values, "domain", {"flagged": "true"})
    rows2 = {r["domain"]: r["flagged"] for r in out2.collect()}
    assert rows2 == rows
