"""geoip2 parity: pure-Python MaxMind DB reader + broadcast lookup
filter (plugins/filter_geoip2/geoip2.c semantics; file format per the
public MaxMind-DB spec)."""

import os

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.enrich_mmdb import (
    MMDBReader,
    MMDBWriter,
    geoip2_filter,
    parse_record_pattern,
)

TD = (
    "/root/reference/plugins/filter_geoip2/libmaxminddb-1.12.2/"
    "t/maxmind-db/test-data/"
)
have_fixtures = os.path.isdir(TD)


def fixture_db() -> bytes:
    w = MMDBWriter()
    w.insert("10.0.0.0/16", {"country": {"iso_code": "US", "names": {"en": "United States"}}})
    w.insert("10.1.0.0/16", {"country": {"iso_code": "DE", "names": {"en": "Germany"}}})
    w.insert("10.2.0.0/16", {"country": {"iso_code": "FR", "names": {"en": "France"}}, "score": 2.5})
    return w.to_bytes()


@pytest.mark.skipif(not have_fixtures, reason="reference fixtures absent")
def test_reader_on_libmaxminddb_fixtures():
    r = MMDBReader(open(TD + "MaxMind-DB-test-ipv4-24.mmdb", "rb").read())
    assert r.lookup("1.1.1.1") == {"ip": "1.1.1.1"}
    assert r.lookup("1.1.1.32") == {"ip": "1.1.1.32"}
    assert r.lookup("9.9.9.9") is None

    geo = MMDBReader(open(TD + "GeoLite2-Country-Test.mmdb", "rb").read())
    e = geo.lookup("81.2.69.142")
    assert geo.get_path(e, ["country", "iso_code"]) == "GB"
    assert geo.get_path(e, ["country", "names", "en"]) == "United Kingdom"
    # map/array terminals are unsupported -> None (geoip2.c:269-276)
    assert geo.get_path(e, ["country", "names"]) is None

    dec = MMDBReader(open(TD + "MaxMind-DB-test-decoder.mmdb", "rb").read())
    e = dec.lookup("1.1.1.0")
    assert dec.get_path(e, ["double"]) == 42.123456
    assert dec.get_path(e, ["boolean"]) is True
    assert dec.get_path(e, ["array", "1"]) == 2

    # v4 address in a v6 tree walks 96 leading zero bits
    mixed = MMDBReader(open(TD + "MaxMind-DB-test-mixed-32.mmdb", "rb").read())
    assert mixed.lookup("1.1.1.1") == {"ip": "::1.1.1.1"}


def test_writer_roundtrip_and_prefix_split():
    r = MMDBReader(fixture_db())
    assert r.lookup("10.0.5.5")["country"]["iso_code"] == "US"
    assert r.lookup("10.2.0.1")["score"] == 2.5
    assert r.lookup("10.3.0.1") is None
    assert r.lookup("not-an-ip") is None
    # covering prefix split: narrow overrides, rest of wide survives
    w = MMDBWriter()
    w.insert("10.0.0.0/8", {"k": "wide"})
    w.insert("10.128.0.0/9", {"k": "narrow"})
    rr = MMDBReader(w.to_bytes())
    assert rr.lookup("10.1.1.1")["k"] == "wide"
    assert rr.lookup("10.200.1.1")["k"] == "narrow"


def test_record_pattern():
    assert parse_record_pattern("%{country.names.en}") == ["country", "names", "en"]
    with pytest.raises(ValueError):
        parse_record_pattern("country.names.en")


def test_geoip2_filter(spark):
    df = spark.createDataFrame(
        [
            (1, "10.0.1.2"),
            (2, "10.1.200.9"),
            (3, "10.2.0.1"),
            (4, "10.3.7.7"),   # not in db -> nulls
            (5, None),          # null lookup value -> nulls
            (6, "garbage"),     # unparseable -> nulls
        ],
        ["id", "remote_addr"],
    )
    out = geoip2_filter(
        df,
        fixture_db(),
        [
            ("country", "remote_addr", "%{country.names.en}"),
            ("iso", "remote_addr", "%{country.iso_code}"),
            ("score", "remote_addr", "%{score}"),
        ],
    ).orderBy("id")
    rows = out.collect()
    assert [r["country"] for r in rows] == [
        "United States", "Germany", "France", None, None, None,
    ]
    assert [r["iso"] for r in rows] == ["US", "DE", "FR", None, None, None]
    assert rows[2]["score"] == "2.5"
    assert rows[0]["score"] is None  # path missing in that record


def test_geoip2_missing_lookup_column(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    out = geoip2_filter(df, fixture_db(), [("iso", "nope", "%{country.iso_code}")])
    assert out.first()["iso"] is None


def test_default_route_and_longest_prefix():
    """A 0.0.0.0/0 entry matches every address not covered by a more
    specific network (geoip2's catch-all case)."""
    from fluent_bit_spark.enrich_mmdb import MMDBReader, MMDBWriter

    w = MMDBWriter(ip_version=4)
    w.insert("0.0.0.0/0", {"country": {"iso_code": "ZZ"}})
    w.insert("10.0.0.0/8", {"country": {"iso_code": "AA"}})
    r = MMDBReader(w.to_bytes())
    assert r.lookup("10.1.2.3") == {"country": {"iso_code": "AA"}}
    assert r.lookup("8.8.8.8") == {"country": {"iso_code": "ZZ"}}
    assert r.lookup("192.168.1.1") == {"country": {"iso_code": "ZZ"}}
