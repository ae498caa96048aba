"""CREATE STREAM re-ingest loop (flb_sp_stream.c:35-153,
in_stream_processor/sp.c:107-117): a created stream's results re-enter
the engine under its tag/alias and are consumable by later queries via
STREAM:name or TAG:'pattern', and by the router when routable."""

import datetime

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.sp import SpEngine

TS = datetime.datetime(2026, 1, 1, 0, 0, 0)


@pytest.fixture()
def engine(spark):
    rows = [
        ("apache.log", TS + datetime.timedelta(seconds=i), f"host{i % 3}", i, 10 + i)
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, ["tag", "event_time", "host", "id", "bytes"])
    eng = SpEngine()
    eng.register_input("apache", df)
    return eng


def test_create_stream_default_tag_is_name(engine):
    engine.execute("CREATE STREAM hot AS SELECT id, bytes FROM STREAM:apache WHERE bytes > 15;")
    out = engine.execute("SELECT id FROM STREAM:hot;")
    assert out.count() == 6
    # re-ingested records carry tag == stream name (sp.c:107-117)
    tags = engine.execute("SELECT * FROM TAG:'hot';").select("tag").distinct().collect()
    assert [r["tag"] for r in tags] == ["hot"]


def test_create_stream_tag_property(engine):
    engine.execute(
        "CREATE STREAM s1 WITH (tag='mydata') AS SELECT id FROM STREAM:apache WHERE id < 4;"
    )
    out = engine.execute("SELECT id FROM TAG:'mydata';")
    assert out.count() == 4
    # STREAM:name binding is case-insensitive (flb_sp.c:169 strcasecmp)
    assert engine.execute("SELECT id FROM STREAM:S1;").count() == 4


def test_tag_queries_see_base_and_created(engine):
    engine.execute(
        "CREATE STREAM extra WITH (tag='apache.extra') AS "
        "SELECT id FROM STREAM:apache WHERE id >= 10;"
    )
    # glob matches the base tag and the created stream's tag
    out = engine.execute("SELECT id FROM TAG:'apache.*';")
    assert out.count() == 12 + 2


def test_row_wise_keeps_event_time(engine):
    engine.execute("CREATE STREAM t AS SELECT id FROM STREAM:apache WHERE id = 3;")
    row = engine.execute("SELECT * FROM STREAM:t;").collect()[0]
    assert row["event_time"] == TS + datetime.timedelta(seconds=3)


def test_windowed_stream_restamps_event_time(engine):
    engine.execute(
        "CREATE STREAM agg AS SELECT SUM(bytes) AS b FROM STREAM:apache "
        "WINDOW TUMBLING (5 SECOND);"
    )
    rows = engine.execute("SELECT * FROM STREAM:agg;").orderBy("event_time").collect()
    assert [r["event_time"] for r in rows] == [
        TS,
        TS + datetime.timedelta(seconds=5),
        TS + datetime.timedelta(seconds=10),
    ]
    assert rows[0]["b"] == sum(10 + i for i in range(5))


def test_routable_false_excluded_from_router(engine):
    engine.execute(
        "CREATE STREAM quiet WITH (routable='false') AS "
        "SELECT id FROM STREAM:apache WHERE id = 0;"
    )
    engine.execute(
        "CREATE STREAM loud AS SELECT id FROM STREAM:apache WHERE id = 1;"
    )
    routed = engine.routable_records()
    tags = {r["tag"] for r in routed.select("tag").distinct().collect()}
    assert tags == {"apache.log", "loud"}
    # but SP TAG: queries still see non-routable chunks (flb_sp.c:2029)
    assert engine.execute("SELECT id FROM TAG:'quiet';").count() == 1


def test_duplicate_name_rejected(engine):
    engine.execute("CREATE STREAM dup AS SELECT id FROM STREAM:apache;")
    with pytest.raises(ValueError, match="already exists"):
        engine.execute("CREATE STREAM dup AS SELECT id FROM STREAM:apache;")
    with pytest.raises(KeyError):
        engine.execute("SELECT id FROM STREAM:nosuch;")


def test_snapshot_create_flush(engine):
    """CREATE SNAPSHOT / FLUSH SNAPSHOT through the engine
    (flb_sp_snapshot.c:25-277): flush-matching records re-emit the
    bounded buffer preceding them."""
    engine.execute(
        "CREATE SNAPSHOT recent AS SELECT * FROM STREAM:apache LIMIT 3;"
    )
    out = engine.execute(
        "FLUSH SNAPSHOT recent AS SELECT * FROM STREAM:apache WHERE id = 5;"
    )
    rows = sorted(r["id"] for r in out.collect())
    assert rows == [3, 4, 5]  # the 3-record buffer ending at the trigger

    with pytest.raises(KeyError):
        engine.execute("FLUSH SNAPSHOT nosuch AS SELECT * FROM STREAM:apache WHERE id = 1;")
    with pytest.raises(ValueError, match="LIMIT"):
        engine.execute("CREATE SNAPSHOT unbounded AS SELECT * FROM STREAM:apache;")


def test_chained_streams_single_scan(engine):
    """Stream-of-stream composes plans: no materialization between hops."""
    engine.execute("CREATE STREAM a AS SELECT id, bytes FROM STREAM:apache WHERE id > 2;")
    engine.execute("CREATE STREAM b AS SELECT id FROM STREAM:a WHERE id < 8;")
    out = engine.execute("SELECT id FROM STREAM:b;")
    assert out.count() == 5
    # one scan of the base table in the composed plan
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1
