"""in_collectd binary network-protocol decode vs the netprot.c
semantics (part walk, TypesDB validation, typed values, abort rules)."""

from __future__ import annotations

import struct

from fluent_bit_spark.sources.collectd import (
    COLLECTD_SCHEMA,
    decode_collectd_packets,
    decode_packet,
    encode_packet,
    parse_typesdb,
)

TDB = parse_typesdb(
    """
# stock collectd types.db excerpts
cpu\t\t\tvalue:DERIVE:0:U
load\t\t\tshortterm:GAUGE:0:5000, midterm:GAUGE:0:5000, longterm:GAUGE:0:5000
if_octets\t\trx:COUNTER:0:4294967295, tx:COUNTER:0:4294967295
uptime\t\t\tvalue:ABSOLUTE:0:U
"""
)


def test_parse_typesdb():
    assert TDB["cpu"] == ["value"]
    assert TDB["load"] == ["shortterm", "midterm", "longterm"]
    assert TDB["if_octets"] == ["rx", "tx"]


def test_decode_full_packet():
    pkt = encode_packet(
        host="web-1", plugin="load", type_="load",
        time_hr=1700000000.5, interval_hr=10.0,
        values=[(1, 0.25), (1, 0.5), (1, 0.75)],
    )
    rows = decode_packet(pkt, TDB)
    assert len(rows) == 3
    host, plugin, pi, typ, ti, t, iv, field, ds, vi, vg = rows[0]
    assert (host, plugin, typ) == ("web-1", "load", "load")
    assert pi is None and ti is None
    assert abs(t - 1700000000.5) < 1e-6 and abs(iv - 10.0) < 1e-9
    assert (field, ds, vi, vg) == ("shortterm", "gauge", None, 0.25)
    assert [r[7] for r in rows] == ["shortterm", "midterm", "longterm"]


def test_header_persists_across_value_parts():
    """collectd batches many metrics per datagram; host/time set once
    apply to every later value part (netprot.c header accumulation)."""
    pkt = (
        encode_packet(host="db-1", time_hr=100.0, plugin="cpu",
                      plugin_instance="0", type_="cpu",
                      values=[(2, 1234)])
        + encode_packet(plugin_instance="1", values=[(2, 5678)])
    )
    rows = decode_packet(pkt, TDB)
    assert len(rows) == 2
    assert rows[0][0] == rows[1][0] == "db-1"  # host persisted
    assert rows[0][2] == "0" and rows[1][2] == "1"
    assert rows[0][8] == "derive" and rows[0][9] == 1234
    assert rows[1][9] == 5678


def test_value_typing_and_twos_complement():
    pkt = encode_packet(type_="if_octets",
                        values=[(0, 2**63 + 5), (0, 42)])
    rows = decode_packet(pkt, TDB)
    assert rows[0][8] == "counter"
    assert rows[0][9] == 2**63 + 5 - 2**64  # uint64 shown 2's-complement
    assert rows[1][9] == 42


def test_count_mismatch_rejects_packet():
    """count != TypesDB field count -> whole value part rejected and
    the rest of the packet aborted (netprot_pack_value :85-88)."""
    bad = encode_packet(type_="load", values=[(1, 1.0)])  # load needs 3
    good = encode_packet(type_="cpu", values=[(2, 7)])
    assert decode_packet(bad + good, TDB) == []
    # but a good part BEFORE the bad one is kept (already committed)
    assert len(decode_packet(good + bad, TDB)) == 1


def test_unknown_type_and_unknown_part_skip():
    unknown_tdb = encode_packet(type_="nosuch", values=[(1, 1.0)])
    assert decode_packet(unknown_tdb, TDB) == []
    # unknown part types are skipped, decode continues
    skip = struct.pack(">HH", 0x0099, 8) + b"\0\0\0\0"
    pkt = skip + encode_packet(type_="cpu", values=[(2, 9)])
    assert [r[9] for r in decode_packet(pkt, TDB)] == [9]


def test_truncated_part_aborts():
    pkt = encode_packet(type_="cpu", values=[(2, 9)])
    assert decode_packet(pkt[:-3], TDB) == []
    # non-NUL-terminated string part leaves the header field unset
    raw = struct.pack(">HH", 0x0000, 8) + b"abcd"  # host, no NUL
    rows = decode_packet(raw + pkt, TDB)
    assert rows[0][0] is None


def test_time_zero_is_null():
    pkt = encode_packet(type_="cpu", values=[(2, 1)])
    rows = decode_packet(pkt, TDB)
    assert rows[0][5] is None and rows[0][6] is None


def test_decode_collectd_packets_spark(spark):
    pkts = [
        (encode_packet(host=f"h{i}", plugin="cpu", type_="cpu",
                       time_hr=1000.0 + i, values=[(2, i * 10)]),)
        for i in range(6)
    ]
    df = spark.createDataFrame(pkts, "packet binary")
    out = decode_collectd_packets(df, TDB)
    assert out.schema.simpleString() == (
        "struct<"
        + COLLECTD_SCHEMA.replace(", ", ",").replace(" ", ":").replace(
            ":long", ":bigint"
        )
        + ">"
    )
    rows = {r["host"]: r for r in out.collect()}
    assert len(rows) == 6
    assert rows["h3"]["value_int"] == 30
    assert rows["h3"]["dstype"] == "derive"
    assert abs(rows["h3"]["time"] - 1003.0) < 1e-6
