"""Minimal MessagePack codec for the filter_wasm msgpack event format.

The reference's ``event_format msgpack`` hands the wasm function the
record body as raw msgpack instead of JSON
(plugins/filter_wasm/filter_wasm.c:125-135,
src/wasm/flb_wasm.c:305-345) and re-ingests the returned buffer as raw
msgpack (filter_wasm.c:196-201). This is a self-contained encoder/
decoder for the msgpack subset a log record can hold — nil, bool,
int, float, str, bin, array, map — following the public MessagePack
spec. No external dependency: the sandbox ships no msgpack wheel, and
the format is small enough that a direct implementation is clearer
than vendoring.
"""

from __future__ import annotations

import struct
from typing import Any


class Ext:
    """msgpack extension value (type code + payload). Needed for the
    Forward protocol's EventTime (fixext8, type 0)."""

    __slots__ = ("code", "data")

    def __init__(self, code: int, data: bytes):
        self.code = code
        self.data = bytes(data)

    def __eq__(self, other):
        return (isinstance(other, Ext) and other.code == self.code
                and other.data == self.data)

    def __repr__(self):
        return f"Ext({self.code}, {self.data!r})"


def packb(v: Any) -> bytes:
    out = bytearray()
    _pack(v, out)
    return bytes(out)


def _pack(v: Any, out: bytearray) -> None:
    if v is None:
        out.append(0xC0)
    elif v is True:
        out.append(0xC3)
    elif v is False:
        out.append(0xC2)
    elif isinstance(v, int):
        if 0 <= v <= 0x7F:
            out.append(v)
        elif -32 <= v < 0:
            out.append(v & 0xFF)
        elif 0 <= v <= 0xFF:
            out += b"\xcc" + struct.pack(">B", v)
        elif 0 <= v <= 0xFFFF:
            out += b"\xcd" + struct.pack(">H", v)
        elif 0 <= v <= 0xFFFFFFFF:
            out += b"\xce" + struct.pack(">I", v)
        elif 0 <= v <= 0xFFFFFFFFFFFFFFFF:
            out += b"\xcf" + struct.pack(">Q", v)
        elif -0x80 <= v < 0:
            out += b"\xd0" + struct.pack(">b", v)
        elif -0x8000 <= v < 0:
            out += b"\xd1" + struct.pack(">h", v)
        elif -0x80000000 <= v < 0:
            out += b"\xd2" + struct.pack(">i", v)
        else:
            out += b"\xd3" + struct.pack(">q", v)
    elif isinstance(v, float):
        out += b"\xcb" + struct.pack(">d", v)
    elif isinstance(v, str):
        b = v.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += b"\xd9" + struct.pack(">B", n)
        elif n <= 0xFFFF:
            out += b"\xda" + struct.pack(">H", n)
        else:
            out += b"\xdb" + struct.pack(">I", n)
        out += b
    elif isinstance(v, (bytes, bytearray)):
        n = len(v)
        if n <= 0xFF:
            out += b"\xc4" + struct.pack(">B", n)
        elif n <= 0xFFFF:
            out += b"\xc5" + struct.pack(">H", n)
        else:
            out += b"\xc6" + struct.pack(">I", n)
        out += bytes(v)
    elif isinstance(v, (list, tuple)):
        n = len(v)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += b"\xdc" + struct.pack(">H", n)
        else:
            out += b"\xdd" + struct.pack(">I", n)
        for item in v:
            _pack(item, out)
    elif isinstance(v, dict):
        n = len(v)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += b"\xde" + struct.pack(">H", n)
        else:
            out += b"\xdf" + struct.pack(">I", n)
        for k, val in v.items():
            _pack(k, out)
            _pack(val, out)
    elif isinstance(v, Ext):
        n = len(v.data)
        fix = {1: 0xD4, 2: 0xD5, 4: 0xD6, 8: 0xD7, 16: 0xD8}.get(n)
        if fix is not None:
            out.append(fix)
        elif n <= 0xFF:
            out += b"\xc7" + struct.pack(">B", n)
        elif n <= 0xFFFF:
            out += b"\xc8" + struct.pack(">H", n)
        else:
            out += b"\xc9" + struct.pack(">I", n)
        out += struct.pack("b", v.code) + v.data
    else:
        raise TypeError(f"cannot msgpack {type(v).__name__}")


class _Reader:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes):
        self.b = b
        self.i = 0

    def take(self, n: int) -> bytes:
        if self.i + n > len(self.b):
            raise ValueError("msgpack truncated")
        v = self.b[self.i : self.i + n]
        self.i += n
        return v

    def u(self, fmt: str, n: int) -> int:
        return struct.unpack(fmt, self.take(n))[0]


def unpackb(b: bytes) -> Any:
    r = _Reader(bytes(b))
    v = _unpack(r)
    return v


def _unpack(r: _Reader) -> Any:
    c = r.take(1)[0]
    if c <= 0x7F:
        return c
    if c >= 0xE0:
        return c - 0x100
    if 0x80 <= c <= 0x8F:
        return {_unpack(r): _unpack(r) for _ in range(c & 0x0F)}
    if 0x90 <= c <= 0x9F:
        return [_unpack(r) for _ in range(c & 0x0F)]
    if 0xA0 <= c <= 0xBF:
        return r.take(c & 0x1F).decode("utf-8")
    if c == 0xC0:
        return None
    if c == 0xC2:
        return False
    if c == 0xC3:
        return True
    if c == 0xC4:
        return r.take(r.u(">B", 1))
    if c == 0xC5:
        return r.take(r.u(">H", 2))
    if c == 0xC6:
        return r.take(r.u(">I", 4))
    if c == 0xCA:
        return r.u(">f", 4)
    if c == 0xCB:
        return r.u(">d", 8)
    if c == 0xCC:
        return r.u(">B", 1)
    if c == 0xCD:
        return r.u(">H", 2)
    if c == 0xCE:
        return r.u(">I", 4)
    if c == 0xCF:
        return r.u(">Q", 8)
    if c == 0xD0:
        return r.u(">b", 1)
    if c == 0xD1:
        return r.u(">h", 2)
    if c == 0xD2:
        return r.u(">i", 4)
    if c == 0xD3:
        return r.u(">q", 8)
    if 0xD4 <= c <= 0xD8:
        n = 1 << (c - 0xD4)
        code = struct.unpack("b", r.take(1))[0]
        return Ext(code, r.take(n))
    if c == 0xC7:
        n = r.u(">B", 1)
        code = struct.unpack("b", r.take(1))[0]
        return Ext(code, r.take(n))
    if c == 0xC8:
        n = r.u(">H", 2)
        code = struct.unpack("b", r.take(1))[0]
        return Ext(code, r.take(n))
    if c == 0xC9:
        n = r.u(">I", 4)
        code = struct.unpack("b", r.take(1))[0]
        return Ext(code, r.take(n))
    if c == 0xD9:
        return r.take(r.u(">B", 1)).decode("utf-8")
    if c == 0xDA:
        return r.take(r.u(">H", 2)).decode("utf-8")
    if c == 0xDB:
        return r.take(r.u(">I", 4)).decode("utf-8")
    if c == 0xDC:
        return [_unpack(r) for _ in range(r.u(">H", 2))]
    if c == 0xDD:
        return [_unpack(r) for _ in range(r.u(">I", 4))]
    if c == 0xDE:
        return {_unpack(r): _unpack(r) for _ in range(r.u(">H", 2))}
    if c == 0xDF:
        return {_unpack(r): _unpack(r) for _ in range(r.u(">I", 4))}
    raise ValueError(f"msgpack: unsupported type byte 0x{c:02x}")
