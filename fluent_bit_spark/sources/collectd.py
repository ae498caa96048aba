"""in_collectd: binary network-protocol decoder + TypesDB loader.

Reference: /root/reference/plugins/in_collectd/netprot.c
netprot_to_msgpack (:236-310) — a packet is a sequence of TLV parts
``be16 type | be16 total_len | payload``; string parts (HOST/PLUGIN/
PLUGIN_INSTANCE/TYPE/TYPE_INSTANCE) update a running header only when
NUL-terminated, numeric parts TIME/INTERVAL are be64 seconds and the
_HR variants are be64 / 2^30 (hr2time, :28), unknown part types are
skipped, and a short/truncated part aborts the rest of the packet
(returns -1). Every PART_VALUE (0x0006) emits records using the
header accumulated SO FAR — headers persist across successive VALUE
parts within a packet, which is how collectd batches many metrics
into one datagram.

netprot_pack_value (:57-233): the VALUE payload is ``be16 count``
then ``count`` type bytes then ``count`` 8-byte values; total size
must be exactly ``2 + count*9`` and ``count`` must equal the
TypesDB entry's field count for ``hdr.type`` (else the whole packet
is rejected). Value encodings by DS type byte: COUNTER(0)/ABSOLUTE(3)
= be uint64, DERIVE(2) = be int64, GAUGE(1) = *native little-endian*
double (collectd sends x86 memory order for gauges only). ``time`` /
``interval`` keys are only set when > 0.

TypesDB (typesdb_parser.c state machine): ``name  f1:TYPE:min:max,
f2:...`` per line, ``#`` comments; only the field NAME (text before
the first ':') is kept per field (typesdb.c typesdb_add_field).

Spark shape: instead of the reference's per-record msgpack map this
emits a LONG-FORMAT row per (value part, field) — host, plugin,
plugin_instance, type, type_instance, time, interval, field, dstype,
value_int (counter/derive/absolute; uint64 shown two's-complement),
value_gauge (gauge) — the tidy layout a telemetry warehouse wants;
the reference's one-map-per-value-part is ``groupBy`` recoverable.
Decode runs in mapInPandas (Arrow batches, one Python TLV walk per
packet — packets are KB-sized; the walk is not the hot path).
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame

PART_HOST = 0x0000
PART_TIME = 0x0001
PART_PLUGIN = 0x0002
PART_PLUGIN_INSTANCE = 0x0003
PART_TYPE = 0x0004
PART_TYPE_INSTANCE = 0x0005
PART_VALUE = 0x0006
PART_INTERVAL = 0x0007
PART_TIME_HR = 0x0008
PART_INTERVAL_HR = 0x0009

DS_TYPE_NAMES = {0: "counter", 1: "gauge", 2: "derive", 3: "absolute"}

COLLECTD_SCHEMA = (
    "host string, plugin string, plugin_instance string, type string, "
    "type_instance string, time double, interval double, field string, "
    "dstype string, value_int long, value_gauge double"
)

_COLS = [c.split(" ")[0] for c in COLLECTD_SCHEMA.split(", ")]


def parse_typesdb(text: str) -> dict[str, list[str]]:
    """types.db text -> {type name: [field names]}.

    Mirrors the typesdb_parser.c state machine outcome: '#' starts a
    comment line, the left token is the type name, the right side is
    comma-and/or-space separated field specs of which only the text
    before the first ':' is the field name.
    """
    out: dict[str, list[str]] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        split = line.split(None, 1)
        if len(split) != 2:
            continue
        name, rest = split
        fields = []
        for spec in rest.replace(",", " ").split():
            fname = spec.split(":", 1)[0]
            if fname:
                fields.append(fname)
        if fields:
            # last definition wins, like reloading types.db files in
            # sequence (typesdb_load_all iterates paths in order)
            out[name] = fields
    return out


def decode_packet(buf: bytes, typesdb: dict[str, list[str]]) -> list[tuple]:
    """One packet -> long-format rows. A corrupt part aborts the rest
    of the packet but keeps rows already decoded, matching the
    reference's encoder-commit-then-fail behavior."""
    rows: list[tuple] = []
    host = plugin = plugin_instance = typ = type_instance = None
    time = interval = 0.0
    pos, n = 0, len(buf)
    while n - pos >= 4:
        part_type, part_len = struct.unpack_from(">HH", buf, pos)
        if part_len < 4 or n - pos < part_len:
            break  # data truncated -> abort packet
        payload = buf[pos + 4 : pos + part_len]
        size = part_len - 4
        if part_type in (PART_TIME, PART_TIME_HR, PART_INTERVAL,
                         PART_INTERVAL_HR) and size < 8:
            break  # numeric part truncated -> abort
        if part_type == PART_HOST:
            if size and payload[-1] == 0:
                host = payload[:-1].decode("utf-8", "replace")
        elif part_type == PART_PLUGIN:
            if size and payload[-1] == 0:
                plugin = payload[:-1].decode("utf-8", "replace")
        elif part_type == PART_PLUGIN_INSTANCE:
            if size and payload[-1] == 0:
                plugin_instance = payload[:-1].decode("utf-8", "replace")
        elif part_type == PART_TYPE:
            if size and payload[-1] == 0:
                typ = payload[:-1].decode("utf-8", "replace")
        elif part_type == PART_TYPE_INSTANCE:
            if size and payload[-1] == 0:
                type_instance = payload[:-1].decode("utf-8", "replace")
        elif part_type == PART_TIME:
            time = float(struct.unpack_from(">Q", payload)[0])
        elif part_type == PART_TIME_HR:
            time = struct.unpack_from(">Q", payload)[0] / 1073741824
        elif part_type == PART_INTERVAL:
            interval = float(struct.unpack_from(">Q", payload)[0])
        elif part_type == PART_INTERVAL_HR:
            interval = struct.unpack_from(">Q", payload)[0] / 1073741824
        elif part_type == PART_VALUE:
            if typ is None:
                break  # type is NULL -> invalid data
            if size < 2:
                break
            (count,) = struct.unpack_from(">H", payload)
            if size != 2 + count * 9:
                break  # data corrupted
            fields = typesdb.get(typ)
            if fields is None or len(fields) != count:
                break  # no such type / field-count mismatch
            part_start = len(rows)  # rollback unit = this value part
            for i in range(count):
                ds = payload[2 + i]
                off = 2 + count + 8 * i
                vi = vg = None
                if ds == 1:  # gauge: native (LE) double
                    (vg,) = struct.unpack_from("<d", payload, off)
                elif ds in (0, 2, 3):  # counter/derive/absolute: be64
                    (u,) = struct.unpack_from(">Q", payload, off)
                    vi = u - (1 << 64) if u >= 1 << 63 else u
                else:
                    # unknown data type: the reference rolls back the
                    # whole record for this value part, then aborts
                    del rows[part_start:]
                    break
                rows.append((
                    host, plugin, plugin_instance, typ, type_instance,
                    time if time > 0 else None,
                    interval if interval > 0 else None,
                    fields[i], DS_TYPE_NAMES[ds], vi, vg,
                ))
            else:
                pos += part_len
                continue
            break  # inner abort propagates
        # unknown part types: skip silently (flb_debug path)
        pos += part_len
    return rows


def decode_collectd_packets(
    df: DataFrame,
    typesdb: dict[str, list[str]],
    packet_col: str = "packet",
) -> DataFrame:
    """DataFrame of binary collectd packets -> long-format metric rows.

    Arrow-batched; the TypesDB dict rides the closure (it is a few KB
    — collectd's stock types.db has ~250 entries), so no join or
    broadcast is needed.
    """
    import pandas as pd

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for buf in pdf[packet_col]:
                if buf is not None:
                    out.extend(decode_packet(bytes(buf), typesdb))
            yield pd.DataFrame(out, columns=_COLS)

    return df.select(packet_col).mapInPandas(walk, COLLECTD_SCHEMA)


def encode_packet(
    host: str | None = None,
    plugin: str | None = None,
    plugin_instance: str | None = None,
    type_: str | None = None,
    type_instance: str | None = None,
    time_hr: float | None = None,
    interval_hr: float | None = None,
    values: list[tuple[int, float | int]] | None = None,
) -> bytes:
    """Assemble a wire packet (test/fixture helper — the inverse of
    decode_packet, matching collectd's network plugin layout)."""
    def spart(pt: int, s: str) -> bytes:
        b = s.encode() + b"\0"
        return struct.pack(">HH", pt, 4 + len(b)) + b

    def npart(pt: int, v: int) -> bytes:
        return struct.pack(">HHQ", pt, 12, v)

    out = b""
    if host is not None:
        out += spart(PART_HOST, host)
    if time_hr is not None:
        out += npart(PART_TIME_HR, int(time_hr * 1073741824))
    if plugin is not None:
        out += spart(PART_PLUGIN, plugin)
    if plugin_instance is not None:
        out += spart(PART_PLUGIN_INSTANCE, plugin_instance)
    if type_ is not None:
        out += spart(PART_TYPE, type_)
    if type_instance is not None:
        out += spart(PART_TYPE_INSTANCE, type_instance)
    if interval_hr is not None:
        out += npart(PART_INTERVAL_HR, int(interval_hr * 1073741824))
    if values:
        body = struct.pack(">H", len(values))
        body += bytes(ds for ds, _ in values)
        for ds, v in values:
            if ds == 1:
                body += struct.pack("<d", float(v))
            else:
                body += struct.pack(">Q", int(v) & ((1 << 64) - 1))
        out += struct.pack(">HH", PART_VALUE, 4 + len(body)) + body
    return out
