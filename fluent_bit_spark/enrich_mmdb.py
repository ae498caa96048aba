"""MaxMind DB (mmdb) enrich: geoip2 filter parity behind the existing
broadcast lookup-join contract.

The reference's filter_geoip2 (plugins/filter_geoip2/geoip2.c) opens a
.mmdb with libmaxminddb, and per record: takes the ``Lookup_key``
field's value as an IP string, walks the binary search tree
(``mmdb_lookup``, geoip2.c:180-195), extracts the ``Record``-directive
path (``%{country.names.en}`` -> MMDB_aget_value, geoip2.c:196-330),
and appends the value under the new key — null when the lookup key is
absent, the IP is not found, the path is missing, or the value is a
map/array (geoip2.c:228-276).

This module implements the same pipeline Spark-first:

- ``MMDBReader``: a pure-Python reader of the public MaxMind DB file
  format (spec: maxmind.github.io/MaxMind-DB — binary search tree of
  2-bit-record nodes, data section with typed fields, metadata map
  after the \\xab\\xcd\\xefMaxMind.com marker). No libmaxminddb
  needed; only the format spec.
- ``MMDBWriter``: a minimal writer used to build deterministic test
  fixtures (CIDR -> record map); round-trips through the reader.
- ``geoip2_filter``: the Spark operator. The mmdb **bytes** ship once
  per executor as a SparkContext broadcast; lookups run inside an
  Arrow-batched pandas UDF with a per-batch memo over distinct IPs
  (hot IPs cost one trie walk per batch, not per row). This is the
  "pandas_udf with a broadcast mmdb reader" shape from SURVEY §2.4 —
  a true broadcast hash join is impossible because the join key is a
  longest-prefix-match, not an equality.
"""

from __future__ import annotations

import ipaddress
import struct
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"

# data-section type codes (spec "Output Data Section")
_T_POINTER = 1
_T_UTF8 = 2
_T_DOUBLE = 3
_T_BYTES = 4
_T_UINT16 = 5
_T_UINT32 = 6
_T_MAP = 7
_T_INT32 = 8
_T_UINT64 = 9
_T_UINT128 = 10
_T_ARRAY = 11
_T_BOOL = 14
_T_FLOAT = 15


class MMDBReader:
    """Decode + longest-prefix lookup over an in-memory mmdb buffer."""

    def __init__(self, buf: bytes):
        self.buf = buf
        idx = buf.rfind(_METADATA_MARKER)
        if idx < 0:
            raise ValueError("not an mmdb: metadata marker missing")
        # metadata pointers (string dedup) are relative to the
        # metadata section start
        meta, _ = self._decode(
            idx + len(_METADATA_MARKER), base=idx + len(_METADATA_MARKER)
        )
        self.metadata = meta
        self.node_count = int(meta["node_count"])
        self.record_size = int(meta["record_size"])  # bits: 24 / 28 / 32
        self.ip_version = int(meta.get("ip_version", 4))
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        # data section starts after a 16-byte zero separator
        self.data_start = self.tree_size + 16

    # ---- data section ------------------------------------------------

    def _decode(self, off: int, base: int | None = None) -> tuple[Any, int]:
        """Decode one field at absolute offset ``off``; returns
        (value, next_offset). ``base`` is the data-section origin for
        pointer resolution (defaults to self.data_start; metadata
        decoding passes 0 and contains no pointers per spec)."""
        buf = self.buf
        ctrl = buf[off]
        off += 1
        typ = ctrl >> 5
        if typ == 0:  # extended type
            typ = buf[off] + 7
            off += 1
        size = ctrl & 0x1F

        if typ == _T_POINTER:
            ss = (ctrl >> 3) & 0x3
            vv = ctrl & 0x7
            if ss == 0:
                ptr = (vv << 8) | buf[off]
                off += 1
            elif ss == 1:
                ptr = (vv << 16) | (buf[off] << 8) | buf[off + 1]
                ptr += 2048
                off += 2
            elif ss == 2:
                ptr = (vv << 24) | int.from_bytes(buf[off : off + 3], "big")
                ptr += 526336
                off += 3
            else:
                ptr = int.from_bytes(buf[off : off + 4], "big")
                off += 4
            origin = self.data_start if base is None else base
            val, _ = self._decode(origin + ptr, base)
            return val, off

        if size == 29:
            size = 29 + buf[off]
            off += 1
        elif size == 30:
            size = 285 + int.from_bytes(buf[off : off + 2], "big")
            off += 2
        elif size == 31:
            size = 65821 + int.from_bytes(buf[off : off + 3], "big")
            off += 3

        if typ == _T_UTF8:
            return buf[off : off + size].decode("utf-8"), off + size
        if typ == _T_DOUBLE:
            return struct.unpack(">d", buf[off : off + 8])[0], off + 8
        if typ == _T_FLOAT:
            return struct.unpack(">f", buf[off : off + 4])[0], off + 4
        if typ == _T_BYTES:
            return buf[off : off + size], off + size
        if typ in (_T_UINT16, _T_UINT32, _T_UINT64, _T_UINT128):
            return int.from_bytes(buf[off : off + size], "big"), off + size
        if typ == _T_INT32:
            return int.from_bytes(buf[off : off + size], "big", signed=True), off + size
        if typ == _T_MAP:
            out: dict[str, Any] = {}
            for _ in range(size):
                k, off = self._decode(off, base)
                v, off = self._decode(off, base)
                out[k] = v
            return out, off
        if typ == _T_ARRAY:
            arr = []
            for _ in range(size):
                v, off = self._decode(off, base)
                arr.append(v)
            return arr, off
        if typ == _T_BOOL:
            return bool(size), off
        raise ValueError(f"unsupported mmdb field type {typ}")

    # ---- search tree -------------------------------------------------

    def _read_record(self, node: int, side: int) -> int:
        buf = self.buf
        base = node * self.node_bytes
        if self.record_size == 24:
            o = base + side * 3
            return int.from_bytes(buf[o : o + 3], "big")
        if self.record_size == 28:
            if side == 0:
                return ((buf[base + 3] >> 4) << 24) | int.from_bytes(
                    buf[base : base + 3], "big"
                )
            return ((buf[base + 3] & 0x0F) << 24) | int.from_bytes(
                buf[base + 4 : base + 7], "big"
            )
        if self.record_size == 32:
            o = base + side * 4
            return int.from_bytes(buf[o : o + 4], "big")
        raise ValueError(f"unsupported record_size {self.record_size}")

    def lookup(self, ip: str) -> Any | None:
        """Longest-prefix match; returns the decoded record (usually a
        map) or None when the address is not in the database."""
        try:
            addr = ipaddress.ip_address(ip.strip())
        except ValueError:
            return None
        if addr.version == 6 and self.ip_version == 4:
            return None
        bits = addr.packed
        nbits = len(bits) * 8
        node = 0
        # a v4 address in a v6 tree walks 96 leading zero bits
        # (libmaxminddb's ipv4_start shortcut, done literally here)
        if addr.version == 4 and self.ip_version == 6:
            for _ in range(96):
                rec = self._read_record(node, 0)
                if rec == self.node_count:
                    return None  # empty record: not found
                if rec > self.node_count:
                    # a covering record above the v4-mapped range
                    # (e.g. ::/0) matches every IPv4 address
                    val, _ = self._decode(self.tree_size + (rec - self.node_count))
                    return val
                node = rec
        for i in range(nbits):
            bit = (bits[i >> 3] >> (7 - (i & 7))) & 1
            rec = self._read_record(node, bit)
            if rec == self.node_count:
                return None  # empty record: not found
            if rec > self.node_count:
                val, _ = self._decode(self.tree_size + (rec - self.node_count))
                return val
            node = rec
        return None

    @staticmethod
    def get_path(entry: Any, path: list[str]) -> Any | None:
        """MMDB_aget_value analog: walk map keys (and numeric array
        indexes); None when any step is missing. Terminal maps/arrays
        are unsupported -> None (geoip2.c:269-276)."""
        cur = entry
        for p in path:
            if isinstance(cur, dict):
                if p not in cur:
                    return None
                cur = cur[p]
            elif isinstance(cur, list):
                try:
                    cur = cur[int(p)]
                except (ValueError, IndexError):
                    return None
            else:
                return None
        if isinstance(cur, (dict, list)):
            return None
        return cur


class MMDBWriter:
    """Minimal spec-conforming writer for deterministic test fixtures:
    insert(cidr, record-map of scalars), then to_bytes(). 24-bit
    records, one data copy per distinct record (dict-keyed dedup)."""

    def __init__(self, ip_version: int = 4, database_type: str = "Test-DB"):
        if ip_version != 4:
            raise ValueError("fixture writer supports ip_version=4")
        self.ip_version = ip_version
        self.database_type = database_type
        self.entries: list[tuple[int, int, dict]] = []  # (net_int, prefix, rec)

    def insert(self, cidr: str, record: dict) -> None:
        net = ipaddress.ip_network(cidr, strict=True)
        if net.version != 4:
            raise ValueError("ipv4 fixtures only")
        self.entries.append((int(net.network_address), net.prefixlen, record))

    # ---- field encoding ---------------------------------------------

    @staticmethod
    def _ctrl(typ: int, size: int) -> bytes:
        if size > 28:
            raise ValueError("fixture fields are small")
        if typ <= 7:
            return bytes([(typ << 5) | size])
        return bytes([size, typ - 7])  # extended

    def _encode(self, v: Any) -> bytes:
        if isinstance(v, bool):
            return self._ctrl(_T_BOOL, 1 if v else 0)
        if isinstance(v, str):
            b = v.encode("utf-8")
            return self._ctrl(_T_UTF8, len(b)) + b
        if isinstance(v, float):
            return self._ctrl(_T_DOUBLE, 8) + struct.pack(">d", v)
        if isinstance(v, int):
            if v < 0:
                return self._ctrl(_T_INT32, 4) + v.to_bytes(4, "big", signed=True)
            b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
            return self._ctrl(_T_UINT32, len(b)) + b
        if isinstance(v, dict):
            out = self._ctrl(_T_MAP, len(v))
            for k, val in v.items():
                out += self._encode(str(k)) + self._encode(val)
            return out
        if isinstance(v, list):
            out = self._ctrl(_T_ARRAY, len(v))
            for val in v:
                out += self._encode(val)
            return out
        raise ValueError(f"unsupported fixture value {type(v)}")

    def to_bytes(self) -> bytes:
        # data section (dedup identical records)
        data = bytearray()
        offsets: dict[bytes, int] = {}
        rec_offset: list[int] = []
        for _, _, rec in self.entries:
            blob = self._encode(rec)
            if blob not in offsets:
                offsets[blob] = len(data) + 16  # past the separator
                data.extend(blob)
            rec_offset.append(offsets[blob])

        # binary trie: node = [left, right], values = ("node", i) |
        # ("data", off) | None
        nodes: list[list] = [[None, None]]

        def add(net: int, plen: int, doff: int) -> None:
            if plen == 0:
                # default route (0.0.0.0/0): both root branches carry
                # the record; inserted first (shortest prefix), so any
                # longer prefix later overwrites/splits its side
                for bit in (0, 1):
                    if not (
                        isinstance(nodes[0][bit], tuple)
                        and nodes[0][bit][0] == "node"
                    ):
                        nodes[0][bit] = ("data", doff)
                return
            cur = 0
            for d in range(plen):
                bit = (net >> (31 - d)) & 1
                nxt = nodes[cur][bit]
                if d == plen - 1:
                    nodes[cur][bit] = ("data", doff)
                    return
                if not (isinstance(nxt, tuple) and nxt[0] == "node"):
                    # splitting a covering (shorter) prefix: both
                    # children inherit its data until overwritten
                    inherit = nxt if isinstance(nxt, tuple) else None
                    nodes.append([inherit, inherit])
                    nodes[cur][bit] = ("node", len(nodes) - 1)
                cur = nodes[cur][bit][1]

        # longest prefix wins: insert shorter prefixes first so more
        # specific networks overwrite their subtree path
        order = sorted(range(len(self.entries)), key=lambda i: self.entries[i][1])
        for i in order:
            net, plen, _ = self.entries[i]
            add(net, plen, rec_offset[i])

        node_count = len(nodes)
        tree = bytearray()
        for left, right in nodes:
            for side in (left, right):
                if side is None:
                    val = node_count  # empty: not found
                elif side[0] == "node":
                    val = side[1]
                else:
                    val = node_count + side[1]
                tree.extend(val.to_bytes(3, "big"))

        meta = {
            "binary_format_major_version": 2,
            "binary_format_minor_version": 0,
            "build_epoch": 0,
            "database_type": self.database_type,
            "description": {"en": "fixture"},
            "ip_version": self.ip_version,
            "languages": ["en"],
            "node_count": node_count,
            "record_size": 24,
        }
        return (
            bytes(tree)
            + b"\x00" * 16
            + bytes(data)
            + _METADATA_MARKER
            + self._encode(meta)
        )


def parse_record_pattern(value: str) -> list[str]:
    """``%{country.names.en}`` -> path components (geoip2.c:240-253)."""
    v = value.strip()
    if not (v.startswith("%{") and v.endswith("}")):
        raise ValueError(f"record value must look like %{{a.b.c}}, got {value!r}")
    return v[2:-1].split(".")


def geoip2_filter(
    df: DataFrame,
    mmdb: bytes,
    records: list[tuple[str, str, str]],
) -> DataFrame:
    """Append geoip fields: for each (new_key, lookup_key, pattern)
    Record directive, look the row's ``lookup_key`` column up in the
    broadcast mmdb and add ``new_key`` with the pattern's value (null
    on any miss — reference null semantics, geoip2.c:228-276). Values
    are stringified (one Spark column type; the reference keeps native
    scalar types inside msgpack — documented delta)."""
    from pyspark.sql import types as T

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(mmdb)
    parsed = [(nk, lk, parse_record_pattern(pat)) for nk, lk, pat in records]

    out = df
    # group the Record directives by lookup key: one UDF pass (and one
    # memoized trie walk per distinct IP) serves every pattern on that key
    by_lookup: dict[str, list[tuple[str, list[str]]]] = {}
    for nk, lk, path in parsed:
        by_lookup.setdefault(lk, []).append((nk, path))

    for lk, items in by_lookup.items():
        names = [nk for nk, _ in items]
        paths = [p for _, p in items]
        schema = T.StructType([T.StructField(nk, T.StringType()) for nk in names])

        lookup_udf = _make_lookup_udf(bc, paths, names, schema)

        if lk in out.columns:
            src = F.col(lk).cast("string")
        else:
            src = F.lit(None).cast("string")  # missing lookup key -> nulls
        tmp = f"_geo_{lk}"
        out = out.withColumn(tmp, lookup_udf(src))
        for nk, _ in items:
            out = out.withColumn(nk, F.col(tmp)[nk])
        out = out.drop(tmp)
    return out


def _make_lookup_udf(bc, paths: list[list[str]], names: list[str], schema):
    """Factory closing over (broadcast buffer, paths, names) — a
    pandas_udf needs type hints on every parameter, so the bindings
    can't ride as default args."""

    @F.pandas_udf(schema)
    def lookup_udf(s: pd.Series) -> pd.DataFrame:
        reader = MMDBReader(bc.value)
        memo: dict[str, list] = {}
        cols: list[list] = [[] for _ in names]
        for ip in s:
            if ip is None:
                vals = [None] * len(names)
            else:
                ip = str(ip)
                vals = memo.get(ip)
                if vals is None:
                    entry = reader.lookup(ip)
                    vals = [
                        None
                        if entry is None
                        else _to_str(reader.get_path(entry, p))
                        for p in paths
                    ]
                    memo[ip] = vals
            for i, v in enumerate(vals):
                cols[i].append(v)
        return pd.DataFrame({n: cols[i] for i, n in enumerate(names)})

    return lookup_udf


def _to_str(v: Any) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, float):
        return repr(v)
    return str(v)
