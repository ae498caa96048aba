"""WebAssembly MVP binary decoder.

Parses a core-wasm-1.0 module (plus the sign-extension, saturating
float-to-int, and bulk-memory extensions LLVM emits by default) into
plain Python structures ready for the tree-walking interpreter in
``interp.py``. This backs filter_wasm the same way the pure-Python Lua
interpreter backs filter_lua: the reference embeds WAMR
(/root/reference/src/wasm/flb_wasm.c:180 wasm_runtime_load); we decode
and execute the same binaries in-process so the operator can run
inside Arrow-batched mapInPandas with no native runtime.

Only the features a wasm32 filter needs are supported: one linear
memory, funcref tables + call_indirect, globals, data/element
segments, imports (resolved by the interpreter's host table), exports,
and the full MVP numeric/control instruction set. Unsupported opcodes
raise WasmDecodeError at load time, never mid-execution.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


class WasmDecodeError(ValueError):
    pass


# ---------------------------------------------------------------- LEB128


class Reader:
    __slots__ = ("b", "pos")

    def __init__(self, b: bytes, pos: int = 0):
        self.b = b
        self.pos = pos

    def eof(self) -> bool:
        return self.pos >= len(self.b)

    def byte(self) -> int:
        try:
            v = self.b[self.pos]
        except IndexError:
            raise WasmDecodeError("unexpected end of section")
        self.pos += 1
        return v

    def bytes(self, n: int) -> bytes:
        if self.pos + n > len(self.b):
            raise WasmDecodeError("unexpected end of section")
        v = self.b[self.pos : self.pos + n]
        self.pos += n
        return v

    def u32(self) -> int:
        result = 0
        shift = 0
        while True:
            byte = self.byte()
            result |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 35:
                raise WasmDecodeError("u32 LEB128 too long")
        return result

    def s32(self) -> int:
        return self._sleb(32)

    def s64(self) -> int:
        return self._sleb(64)

    def _sleb(self, bits: int) -> int:
        result = 0
        shift = 0
        while True:
            byte = self.byte()
            result |= (byte & 0x7F) << shift
            shift += 7
            if not byte & 0x80:
                if shift < bits and byte & 0x40:
                    result |= -1 << shift
                break
            if shift > bits + 7:
                raise WasmDecodeError("sLEB128 too long")
        return result

    def f32(self) -> float:
        return struct.unpack("<f", self.bytes(4))[0]

    def f64(self) -> float:
        return struct.unpack("<d", self.bytes(8))[0]

    def name(self) -> str:
        n = self.u32()
        return self.bytes(n).decode("utf-8")


# ------------------------------------------------------------- structures

# value types
I32, I64, F32, F64 = 0x7F, 0x7E, 0x7D, 0x7C
FUNCREF = 0x70
VALTYPES = {I32, I64, F32, F64}


@dataclass
class FuncType:
    params: tuple
    results: tuple


@dataclass
class Func:
    type_idx: int
    locals: tuple = ()  # expanded valtype list
    body: list = field(default_factory=list)  # decoded instruction tree
    name: str = ""


@dataclass
class Global:
    valtype: int
    mutable: bool
    init: list  # const expr instruction tree


@dataclass
class Import:
    module: str
    name: str
    kind: int  # 0 func, 1 table, 2 mem, 3 global
    desc: object


@dataclass
class Module:
    types: list
    imports: list
    funcs: list  # Func for locally-defined; import placeholders resolved by interp
    n_imported_funcs: int
    table_min: int
    table_max: int | None
    mem_min: int  # pages
    mem_max: int | None
    globals: list
    exports: dict  # name -> (kind, index)
    start: int | None
    elements: list  # (offset_expr, [func indices])
    data: list  # (offset_expr, bytes)
    imported_globals: list  # Import entries, order = global index space prefix


# ------------------------------------------------------------ instruction
# Decoded instruction = (opcode, a, b) tuples; block-structured opcodes
# carry nested lists. Opcode ints are the wire values; 0xFC-prefixed ops
# are encoded as 0xFC00 | sub.

END = 0x0B
ELSE = 0x05

_BLOCK_OPS = (0x02, 0x03)  # block, loop
_IF = 0x04

_MEM_OPS = set(range(0x28, 0x3F))  # loads/stores take memarg
_ONE_U32 = {
    0x0C,
    0x0D,  # br, br_if
    0x10,  # call
    0x20,
    0x21,
    0x22,
    0x23,
    0x24,  # local/global get/set/tee
    0x3F,
    0x40,  # memory.size/grow (mem idx)
}


def _decode_blocktype(r: Reader):
    """Returns result arity (MVP: 0 or 1). Multi-value block types
    (s33 type index) are rejected — LLVM only emits them with
    multivalue enabled, which filter binaries don't use."""
    pos = r.pos
    b = r.byte()
    if b == 0x40:
        return 0
    if b in VALTYPES:
        return 1
    r.pos = pos
    idx = r.s32()
    raise WasmDecodeError(f"multi-value block type {idx} not supported")


def decode_expr(r: Reader, terminators=(END,)) -> tuple[list, int]:
    """Decode an instruction sequence up to END (or ELSE for if-arms).
    Returns (instructions, terminator_opcode)."""
    out = []
    while True:
        op = r.byte()
        if op in terminators:
            return out, op
        if op in _BLOCK_OPS:  # block / loop
            arity = _decode_blocktype(r)
            body, _t = decode_expr(r)
            out.append((op, arity, body))
        elif op == _IF:
            arity = _decode_blocktype(r)
            then, t = decode_expr(r, (END, ELSE))
            els = []
            if t == ELSE:
                els, _ = decode_expr(r)
            out.append((op, arity, (then, els)))
        elif op == 0x0E:  # br_table
            n = r.u32()
            targets = tuple(r.u32() for _ in range(n))
            default = r.u32()
            out.append((op, targets, default))
        elif op == 0x11:  # call_indirect
            type_idx = r.u32()
            table_idx = r.u32()
            out.append((op, type_idx, table_idx))
        elif op in _ONE_U32:
            out.append((op, r.u32(), None))
        elif op in _MEM_OPS:
            _align = r.u32()
            offset = r.u32()
            out.append((op, offset, None))
        elif op == 0x41:  # i32.const
            out.append((op, r.s32() & 0xFFFFFFFF, None))
        elif op == 0x42:  # i64.const
            out.append((op, r.s64() & 0xFFFFFFFFFFFFFFFF, None))
        elif op == 0x43:
            out.append((op, r.f32(), None))
        elif op == 0x44:
            out.append((op, r.f64(), None))
        elif op == 0x1C:  # select with valtype vec (reference-types enc)
            n = r.u32()
            for _ in range(n):
                r.byte()
            out.append((0x1B, None, None))
        elif op == 0xFC:  # saturating trunc / bulk memory
            sub = r.u32()
            if sub <= 7:  # i32/i64.trunc_sat_f32/f64_s/u
                out.append((0xFC00 | sub, None, None))
            elif sub == 8:  # memory.init
                seg = r.u32()
                r.byte()
                out.append((0xFC08, seg, None))
            elif sub == 9:  # data.drop
                out.append((0xFC09, r.u32(), None))
            elif sub == 10:  # memory.copy
                r.byte()
                r.byte()
                out.append((0xFC0A, None, None))
            elif sub == 11:  # memory.fill
                r.byte()
                out.append((0xFC0B, None, None))
            else:
                raise WasmDecodeError(f"unsupported 0xFC opcode {sub}")
        elif 0x45 <= op <= 0xC4 or op in (
            0x00,
            0x01,
            0x0F,
            0x1A,
            0x1B,
        ):
            # plain numeric / parametric / nullary control ops
            out.append((op, None, None))
        else:
            raise WasmDecodeError(f"unsupported opcode 0x{op:02x}")


# ---------------------------------------------------------------- module


def decode_module(data: bytes) -> Module:
    if data[:4] != b"\0asm":
        raise WasmDecodeError("bad magic")
    if data[4:8] != b"\x01\0\0\0":
        raise WasmDecodeError("unsupported wasm version")
    r = Reader(data, 8)

    types: list[FuncType] = []
    imports: list[Import] = []
    func_type_idxs: list[int] = []
    funcs: list[Func] = []
    table_min, table_max = 0, None
    mem_min, mem_max = 0, None
    globals_: list[Global] = []
    imported_globals: list[Import] = []
    exports: dict[str, tuple[int, int]] = {}
    start = None
    elements: list = []
    data_segs: list = []
    n_imported_funcs = 0

    def limits(rr: Reader):
        flag = rr.byte()
        lo = rr.u32()
        hi = rr.u32() if flag & 1 else None
        return lo, hi

    while not r.eof():
        sec_id = r.byte()
        size = r.u32()
        body = Reader(r.bytes(size))
        if sec_id == 1:  # type
            for _ in range(body.u32()):
                if body.byte() != 0x60:
                    raise WasmDecodeError("expected func type")
                params = tuple(body.byte() for _ in range(body.u32()))
                results = tuple(body.byte() for _ in range(body.u32()))
                types.append(FuncType(params, results))
        elif sec_id == 2:  # import
            for _ in range(body.u32()):
                mod, name = body.name(), body.name()
                kind = body.byte()
                if kind == 0:
                    desc = body.u32()  # type idx
                    n_imported_funcs += 1
                elif kind == 1:
                    body.byte()  # elemtype
                    desc = limits(body)
                elif kind == 2:
                    desc = limits(body)
                elif kind == 3:
                    vt = body.byte()
                    mut = body.byte()
                    desc = (vt, bool(mut))
                else:
                    raise WasmDecodeError(f"bad import kind {kind}")
                imp = Import(mod, name, kind, desc)
                imports.append(imp)
                if kind == 3:
                    imported_globals.append(imp)
        elif sec_id == 3:  # function
            func_type_idxs = [body.u32() for _ in range(body.u32())]
        elif sec_id == 4:  # table
            n = body.u32()
            if n:
                body.byte()  # elemtype (funcref)
                table_min, table_max = limits(body)
        elif sec_id == 5:  # memory
            n = body.u32()
            if n:
                mem_min, mem_max = limits(body)
        elif sec_id == 6:  # global
            for _ in range(body.u32()):
                vt = body.byte()
                mut = bool(body.byte())
                init, _ = decode_expr(body)
                globals_.append(Global(vt, mut, init))
        elif sec_id == 7:  # export
            for _ in range(body.u32()):
                name = body.name()
                kind = body.byte()
                idx = body.u32()
                exports[name] = (kind, idx)
        elif sec_id == 8:
            start = body.u32()
        elif sec_id == 9:  # element
            for _ in range(body.u32()):
                flags = body.u32()
                if flags != 0:
                    raise WasmDecodeError(
                        f"element segment flags {flags} not supported"
                    )
                offset, _ = decode_expr(body)
                idxs = [body.u32() for _ in range(body.u32())]
                elements.append((offset, idxs))
        elif sec_id == 10:  # code
            n = body.u32()
            for i in range(n):
                sz = body.u32()
                fr = Reader(body.bytes(sz))
                locs: list[int] = []
                for _ in range(fr.u32()):
                    cnt = fr.u32()
                    vt = fr.byte()
                    locs.extend([vt] * cnt)
                expr, _ = decode_expr(fr)
                funcs.append(
                    Func(func_type_idxs[i], tuple(locs), expr, name=f"func{i}")
                )
        elif sec_id == 11:  # data
            for _ in range(body.u32()):
                flags = body.u32()
                if flags == 0:
                    offset, _ = decode_expr(body)
                    seg = body.bytes(body.u32())
                    data_segs.append((offset, seg))
                elif flags == 1:  # passive
                    seg = body.bytes(body.u32())
                    data_segs.append((None, seg))
                else:
                    raise WasmDecodeError(f"data segment flags {flags}")
        # sec 0 (custom) and 12 (datacount): skipped

    return Module(
        types=types,
        imports=imports,
        funcs=funcs,
        n_imported_funcs=n_imported_funcs,
        table_min=table_min,
        table_max=table_max,
        mem_min=mem_min,
        mem_max=mem_max,
        globals=globals_,
        exports=exports,
        start=start,
        elements=elements,
        data=data_segs,
        imported_globals=imported_globals,
    )
