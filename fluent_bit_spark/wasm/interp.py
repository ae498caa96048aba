"""WebAssembly MVP tree-walking interpreter (pure Python).

Executes modules decoded by ``module.py``. Mirrors the slice of WAMR
behavior the reference relies on for filter_wasm
(/root/reference/src/wasm/flb_wasm.c):

- ``instantiate`` = wasm_runtime_instantiate: builds memory from data
  segments, evaluates global initializers, populates the funcref
  table, runs the start function.
- ``invoke(name, args)`` = wasm_runtime_call_wasm on a looked-up
  export; traps raise WasmTrap (the operator maps a trap to
  "skip record", matching the reference's NULL return on exception,
  flb_wasm.c:273-278).
- ``dup_data`` = wasm_runtime_module_dup_data: copies host bytes into
  module memory via the module's exported allocator when present,
  else a bump allocator above the data segments (WAMR's app heap
  analog).
- Minimal deterministic WASI preview1 stubs so wasm32-wasi binaries
  instantiate (fd_write is captured, random_get zero-fills — no
  entropy, no wall clock: results stay reproducible across
  executors).

Numeric semantics follow the wasm core spec: i32/i64 are stored
unsigned and masked per op, f32 results round through IEEE binary32,
div/rem and float->int truncation trap exactly where the spec says.
"""

from __future__ import annotations

import math
import struct
from typing import Any, Callable

from .module import F32, F64, I32, I64, Module, WasmDecodeError, decode_module

__all__ = [
    "Instance",
    "WasmTrap",
    "WasmDecodeError",
    "decode_module",
]

PAGE = 65536
_RET = 1 << 30  # unwind-all sentinel returned by `return`


class WasmTrap(RuntimeError):
    pass


class ProcExit(WasmTrap):
    def __init__(self, code: int):
        super().__init__(f"proc_exit({code})")
        self.code = code


def _s32(v: int) -> int:
    return v - 0x100000000 if v & 0x80000000 else v


def _s64(v: int) -> int:
    return v - 0x10000000000000000 if v & 0x8000000000000000 else v


def _f32(v: float) -> float:
    try:
        return struct.unpack("<f", struct.pack("<f", v))[0]
    except (OverflowError, ValueError):
        return math.inf if v > 0 else -math.inf


def _div_s(a: int, b: int, bits: int) -> int:
    mask = (1 << bits) - 1
    sa = a - (1 << bits) if a >> (bits - 1) else a
    sb = b - (1 << bits) if b >> (bits - 1) else b
    if sb == 0:
        raise WasmTrap("integer divide by zero")
    q = abs(sa) // abs(sb)
    if (sa < 0) != (sb < 0):
        q = -q
    if q == 1 << (bits - 1):
        raise WasmTrap("integer overflow")
    return q & mask


def _rem_s(a: int, b: int, bits: int) -> int:
    mask = (1 << bits) - 1
    sa = a - (1 << bits) if a >> (bits - 1) else a
    sb = b - (1 << bits) if b >> (bits - 1) else b
    if sb == 0:
        raise WasmTrap("integer divide by zero")
    r = abs(sa) % abs(sb)
    if sa < 0:
        r = -r
    return r & mask


def _trunc(v: float, lo: int, hi: int, mask: int, sat: bool) -> int:
    if math.isnan(v):
        if sat:
            return 0
        raise WasmTrap("invalid conversion to integer")
    t = math.trunc(v)
    if t < lo or t > hi:
        if sat:
            t = lo if t < lo else hi
        else:
            raise WasmTrap("integer overflow")
    return t & mask


def _rotl(v: int, n: int, bits: int) -> int:
    n %= bits
    mask = (1 << bits) - 1
    return ((v << n) | (v >> (bits - n))) & mask


def _nearest(v: float) -> float:
    # round-half-to-even
    f = math.floor(v)
    d = v - f
    if d > 0.5:
        return f + 1.0
    if d < 0.5:
        return float(f)
    return float(f if f % 2 == 0 else f + 1)


class HostFunc:
    __slots__ = ("fn", "n_results")

    def __init__(self, fn: Callable, n_results: int = 1):
        self.fn = fn
        self.n_results = n_results


def _wasi_stubs() -> dict:
    """Deterministic WASI preview1 stubs (enough to instantiate
    wasm32-wasi output of clang/rustc; no filesystem, no entropy)."""

    def fd_write(inst: "Instance", args: list) -> list:
        fd, iovs, n_iovs, nwritten_ptr = args
        total = 0
        for i in range(n_iovs):
            base = inst.load_u32(iovs + 8 * i)
            ln = inst.load_u32(iovs + 8 * i + 4)
            inst.captured_output.append(bytes(inst.memory[base : base + ln]))
            total += ln
        inst.store_u32(nwritten_ptr, total)
        return [0]

    def proc_exit(inst, args):
        raise ProcExit(args[0])

    def zero2(inst, args):
        inst.store_u32(args[0], 0)
        inst.store_u32(args[1], 0)
        return [0]

    def random_get(inst, args):
        ptr, ln = args
        inst.memory[ptr : ptr + ln] = b"\0" * ln
        return [0]

    def clock_time_get(inst, args):
        inst.store_u64(args[2], 0)
        return [0]

    def ret0(inst, args):
        return [0]

    def badf(inst, args):
        return [8]  # WASI errno EBADF

    def fd_read(inst, args):
        # nothing to read on any fd: report 0 bytes (EOF)
        inst.store_u32(args[3], 0)
        return [0]

    return {
        ("wasi_snapshot_preview1", "fd_write"): HostFunc(fd_write),
        ("wasi_snapshot_preview1", "proc_exit"): HostFunc(proc_exit, 0),
        ("wasi_snapshot_preview1", "environ_sizes_get"): HostFunc(zero2),
        ("wasi_snapshot_preview1", "environ_get"): HostFunc(ret0),
        ("wasi_snapshot_preview1", "args_sizes_get"): HostFunc(zero2),
        ("wasi_snapshot_preview1", "args_get"): HostFunc(ret0),
        ("wasi_snapshot_preview1", "random_get"): HostFunc(random_get),
        ("wasi_snapshot_preview1", "clock_time_get"): HostFunc(clock_time_get),
        ("wasi_snapshot_preview1", "fd_close"): HostFunc(ret0),
        ("wasi_snapshot_preview1", "fd_seek"): HostFunc(ret0),
        ("wasi_snapshot_preview1", "fd_fdstat_get"): HostFunc(ret0),
        # no preopened dirs: EBADF(8) tells libpreopen to stop scanning —
        # what a real runtime reports past the last preopen fd
        ("wasi_snapshot_preview1", "fd_prestat_get"): HostFunc(badf),
        ("wasi_snapshot_preview1", "fd_prestat_dir_name"): HostFunc(badf),
        ("wasi_snapshot_preview1", "fd_read"): HostFunc(fd_read),
        ("wasi_snapshot_preview1", "fd_readdir"): HostFunc(badf),
        ("wasi_snapshot_preview1", "path_open"): HostFunc(badf),
        ("wasi_snapshot_preview1", "fd_filestat_get"): HostFunc(badf),
        ("wasi_snapshot_preview1", "path_filestat_get"): HostFunc(badf),
        ("wasi_snapshot_preview1", "poll_oneoff"): HostFunc(ret0),
        ("wasi_snapshot_preview1", "sched_yield"): HostFunc(ret0),
        ("wasi_snapshot_preview1", "clock_res_get"): HostFunc(clock_time_get),
    }


class Instance:
    def __init__(
        self,
        module: Module | bytes,
        imports: dict | None = None,
        max_pages: int = 1024,  # 64 MiB default heap cap (wasm_heap_size analog)
    ):
        if isinstance(module, (bytes, bytearray)):
            module = decode_module(bytes(module))
        self.module = module
        self.max_pages = (
            min(module.mem_max, max_pages) if module.mem_max else max_pages
        )
        self.memory = bytearray(PAGE * module.mem_min)
        self.captured_output: list[bytes] = []
        self.fuel: int | None = None  # optional instruction budget

        host: dict = _wasi_stubs()
        if imports:
            host.update(imports)

        # function index space: imports then local funcs
        self.funcs: list = []
        self.func_types: list = []
        gi = 0
        for imp in module.imports:
            if imp.kind == 0:
                key = (imp.module, imp.name)
                if key not in host:
                    raise WasmDecodeError(
                        f"unresolved import {imp.module}.{imp.name}"
                    )
                fn = host[key]
                if not isinstance(fn, HostFunc):
                    fn = HostFunc(fn)
                self.funcs.append(fn)
                self.func_types.append(module.types[imp.desc])
        for f in module.funcs:
            self.funcs.append(f)
            self.func_types.append(module.types[f.type_idx])

        # globals: imported (values via host dict) then local
        self.globals: list = []
        for imp in module.imported_globals:
            key = (imp.module, imp.name)
            self.globals.append(host.get(key, 0))
        for g in module.globals:
            self.globals.append(self._const_expr(g.init))

        # table
        self.table: list = [None] * module.table_min
        for offset_expr, idxs in module.elements:
            off = self._const_expr(offset_expr)
            end = off + len(idxs)
            if end > len(self.table):
                self.table.extend([None] * (end - len(self.table)))
            for i, fi in enumerate(idxs):
                self.table[off + i] = fi

        # data segments
        self._data_end = PAGE * module.mem_min
        self.passive_data: list = []
        for offset_expr, seg in module.data:
            if offset_expr is None:
                self.passive_data.append(seg)
                continue
            off = self._const_expr(offset_expr)
            if off + len(seg) > len(self.memory):
                raise WasmTrap("data segment out of bounds")
            self.memory[off : off + len(seg)] = seg

        # bump allocator for dup_data when the module exports no malloc
        self._bump0 = len(self.memory)
        self._bump = self._bump0

        if module.start is not None:
            self._call(module.start, [])

    # ------------------------------------------------------------ memory

    def load_u32(self, addr: int) -> int:
        if addr < 0 or addr + 4 > len(self.memory):
            raise WasmTrap("out of bounds memory access")
        return int.from_bytes(self.memory[addr : addr + 4], "little")

    def store_u32(self, addr: int, v: int) -> None:
        if addr < 0 or addr + 4 > len(self.memory):
            raise WasmTrap("out of bounds memory access")
        self.memory[addr : addr + 4] = (v & 0xFFFFFFFF).to_bytes(4, "little")

    def store_u64(self, addr: int, v: int) -> None:
        if addr < 0 or addr + 8 > len(self.memory):
            raise WasmTrap("out of bounds memory access")
        self.memory[addr : addr + 8] = (v & (2**64 - 1)).to_bytes(8, "little")

    def read_cstr(self, addr: int, max_len: int = 1 << 22) -> bytes:
        end = self.memory.find(b"\0", addr, addr + max_len)
        if end < 0:
            raise WasmTrap("unterminated string")
        return bytes(self.memory[addr:end])

    def grow_memory(self, delta_pages: int) -> int:
        old = len(self.memory) // PAGE
        if delta_pages < 0 or old + delta_pages > self.max_pages:
            return 0xFFFFFFFF
        self.memory.extend(bytearray(PAGE * delta_pages))
        return old

    def dup_data(self, data: bytes) -> int:
        """wasm_runtime_module_dup_data analog: place `data` into module
        memory, preferring the module's own allocator."""
        exp = self.module.exports
        for name in ("malloc", "__wbindgen_malloc"):
            if name in exp and exp[name][0] == 0:
                ptr = self.invoke(name, [len(data)])[0]
                self.memory[ptr : ptr + len(data)] = data
                return ptr
        need = len(data)
        if self._bump + need > len(self.memory):
            pages = (self._bump + need - len(self.memory) + PAGE - 1) // PAGE
            if self.grow_memory(pages) == 0xFFFFFFFF:
                raise WasmTrap("dup_data: out of memory")
        ptr = self._bump
        self.memory[ptr : ptr + need] = data
        self._bump += need
        return ptr

    def reset_bump(self) -> None:
        """Release per-record dup_data allocations (the reference
        destroys the whole instance per chunk; we reuse it and rewind
        the bump pointer to its post-instantiation position)."""
        self._bump = self._bump0

    # ------------------------------------------------------------- calls

    def invoke(self, export_name: str, args: list) -> list:
        exp = self.module.exports.get(export_name)
        if exp is None or exp[0] != 0:
            raise WasmTrap(f"export {export_name!r} is not a function")
        return self._call(exp[1], list(args))

    def _call(self, func_idx: int, args: list) -> list:
        f = self.funcs[func_idx]
        if isinstance(f, HostFunc):
            res = f.fn(self, args)
            return list(res) if res is not None else []
        ftype = self.module.types[f.type_idx]
        locals_ = list(args)
        for vt in f.locals:
            locals_.append(0.0 if vt in (F32, F64) else 0)
        stack: list = []
        ctrl: list = [(0, len(ftype.results))]  # function body label
        d = self._exec(f.body, locals_, stack, ctrl)
        if d is not None and d not in (_RET, 0):
            raise WasmTrap("branch out of function")
        n = len(ftype.results)
        return stack[-n:] if n else []

    def _const_expr(self, expr: list):
        stack: list = []
        self._exec(expr, [], stack, [(0, 1)])
        return stack[-1] if stack else 0

    # ----------------------------------------------------------- executor

    def _exec(self, seq: list, loc: list, stack: list, ctrl: list):
        """Run one instruction sequence. Returns None on fall-through,
        or a branch depth to unwind (0 = this level's label)."""
        for inst in seq:
            op = inst[0]
            # ---- most frequent first: locals, consts, hot i32 ops
            if op == 0x20:  # local.get
                stack.append(loc[inst[1]])
            elif op == 0x21:  # local.set
                loc[inst[1]] = stack.pop()
            elif op == 0x22:  # local.tee
                loc[inst[1]] = stack[-1]
            elif op == 0x41 or op == 0x42 or op == 0x43 or op == 0x44:
                stack.append(inst[1])
            elif op == 0x6A:  # i32.add (inlined hot ops)
                b = stack.pop()
                stack[-1] = (stack[-1] + b) & 0xFFFFFFFF
            elif op == 0x6B:  # i32.sub
                b = stack.pop()
                stack[-1] = (stack[-1] - b) & 0xFFFFFFFF
            elif op == 0x46:  # i32.eq
                b = stack.pop()
                stack[-1] = 1 if stack[-1] == b else 0
            elif op == 0x47:  # i32.ne
                b = stack.pop()
                stack[-1] = 1 if stack[-1] != b else 0
            elif op == 0x49:  # i32.lt_u
                b = stack.pop()
                stack[-1] = 1 if stack[-1] < b else 0
            elif op == 0x4B:  # i32.gt_u
                b = stack.pop()
                stack[-1] = 1 if stack[-1] > b else 0
            elif op == 0x45:  # i32.eqz
                stack[-1] = 1 if stack[-1] == 0 else 0
            elif op == 0x2D:  # i32.load8_u (byte scan hot path)
                addr = stack.pop() + inst[1]
                try:
                    stack.append(self.memory[addr])
                except IndexError:
                    raise WasmTrap("out of bounds memory access")
            elif 0x48 <= op <= 0xC4 or op >= 0xFC00:
                self._numeric(op, stack)
            elif 0x28 <= op <= 0x3E:
                self._memop(op, inst[1], stack)
            elif op == 0x02:  # block
                ctrl.append((len(stack), inst[1]))
                d = self._exec(inst[2], loc, stack, ctrl)
                ctrl.pop()
                if d is not None:
                    if d == 0:
                        continue
                    return d - 1 if d != _RET else _RET
            elif op == 0x03:  # loop (br target = loop start, arity 0)
                # entry height is loop-invariant (wasm validation):
                # push the ctrl entry once, not per iteration
                ctrl.append((len(stack), 0))
                body = inst[2]
                while True:
                    d = self._exec(body, loc, stack, ctrl)
                    if d is None:
                        ctrl.pop()
                        break
                    if d == 0:
                        continue  # br to loop head
                    ctrl.pop()
                    return d - 1 if d != _RET else _RET
            elif op == 0x04:  # if
                cond = stack.pop()
                body = inst[2][0] if cond else inst[2][1]
                ctrl.append((len(stack), inst[1]))
                d = self._exec(body, loc, stack, ctrl)
                ctrl.pop()
                if d is not None:
                    if d == 0:
                        continue
                    return d - 1 if d != _RET else _RET
            elif op == 0x0C:  # br
                return self._branch(inst[1], stack, ctrl)
            elif op == 0x0D:  # br_if
                if stack.pop():
                    return self._branch(inst[1], stack, ctrl)
            elif op == 0x0E:  # br_table
                i = stack.pop()
                targets, default = inst[1], inst[2]
                depth = targets[i] if i < len(targets) else default
                return self._branch(depth, stack, ctrl)
            elif op == 0x0F:  # return
                return _RET
            elif op == 0x10:  # call
                self._do_call(inst[1], stack)
            elif op == 0x11:  # call_indirect
                self._call_indirect(inst[1], stack)
            elif op == 0x1A:  # drop
                stack.pop()
            elif op == 0x1B:  # select
                c = stack.pop()
                b = stack.pop()
                a = stack.pop()
                stack.append(a if c else b)
            elif op == 0x23:  # global.get
                stack.append(self.globals[inst[1]])
            elif op == 0x24:  # global.set
                self.globals[inst[1]] = stack.pop()
            elif op == 0x3F:  # memory.size
                stack.append(len(self.memory) // PAGE)
            elif op == 0x40:  # memory.grow
                stack.append(self.grow_memory(stack.pop()))
            elif op == 0x00:  # unreachable
                raise WasmTrap("unreachable")
            elif op == 0x01:  # nop
                pass
            else:
                raise WasmTrap(f"unhandled opcode 0x{op:02x}")
        return None

    @staticmethod
    def _branch(depth: int, stack: list, ctrl: list) -> int:
        base, arity = ctrl[-1 - depth]
        if arity:
            keep = stack[-arity:]
            del stack[base:]
            stack.extend(keep)
        else:
            del stack[base:]
        return depth

    def _do_call(self, func_idx: int, stack: list) -> None:
        ftype = self.func_types[func_idx]
        n = len(ftype.params)
        args = stack[len(stack) - n :] if n else []
        if n:
            del stack[len(stack) - n :]
        stack.extend(self._call(func_idx, args))

    def _call_indirect(self, type_idx: int, stack: list) -> None:
        i = stack.pop()
        if i >= len(self.table) or self.table[i] is None:
            raise WasmTrap("undefined table element")
        fi = self.table[i]
        expect = self.module.types[type_idx]
        actual = self.func_types[fi]
        if (expect.params, expect.results) != (actual.params, actual.results):
            raise WasmTrap("indirect call type mismatch")
        self._do_call(fi, stack)

    # ------------------------------------------------------------ memory ops

    _LOADS = {
        0x28: ("<I", 4, None),  # i32.load
        0x29: ("<Q", 8, None),  # i64.load
        0x2A: ("<f", 4, None),  # f32.load
        0x2B: ("<d", 8, None),  # f64.load
        0x2C: ("<b", 1, 0xFFFFFFFF),  # i32.load8_s
        0x2D: ("<B", 1, None),  # i32.load8_u
        0x2E: ("<h", 2, 0xFFFFFFFF),  # i32.load16_s
        0x2F: ("<H", 2, None),  # i32.load16_u
        0x30: ("<b", 1, 0xFFFFFFFFFFFFFFFF),  # i64.load8_s
        0x31: ("<B", 1, None),
        0x32: ("<h", 2, 0xFFFFFFFFFFFFFFFF),
        0x33: ("<H", 2, None),
        0x34: ("<i", 4, 0xFFFFFFFFFFFFFFFF),  # i64.load32_s
        0x35: ("<I", 4, None),
    }
    _STORES = {
        0x36: ("<I", 4, 0xFFFFFFFF),  # i32.store
        0x37: ("<Q", 8, 0xFFFFFFFFFFFFFFFF),  # i64.store
        0x38: ("<f", 4, None),  # f32.store
        0x39: ("<d", 8, None),  # f64.store
        0x3A: ("<B", 1, 0xFF),
        0x3B: ("<H", 2, 0xFFFF),
        0x3C: ("<B", 1, 0xFF),  # i64.store8
        0x3D: ("<H", 2, 0xFFFF),
        0x3E: ("<I", 4, 0xFFFFFFFF),  # i64.store32
    }

    def _memop(self, op: int, offset: int, stack: list) -> None:
        mem = self.memory
        if op <= 0x35:  # load
            fmt, size, smask = self._LOADS[op]
            addr = stack.pop() + offset
            if addr < 0 or addr + size > len(mem):
                raise WasmTrap("out of bounds memory access")
            v = struct.unpack_from(fmt, mem, addr)[0]
            if smask is not None:
                v &= smask
            stack.append(v)
        else:  # store
            fmt, size, vmask = self._STORES[op]
            v = stack.pop()
            addr = stack.pop() + offset
            if addr < 0 or addr + size > len(mem):
                raise WasmTrap("out of bounds memory access")
            if vmask is not None:
                v &= vmask
            try:
                struct.pack_into(fmt, mem, addr, v)
            except struct.error:
                # f32 overflow when packing a python double
                if fmt == "<f":
                    struct.pack_into(fmt, mem, addr, math.copysign(math.inf, v))
                else:
                    raise

    # ------------------------------------------------------------ numeric

    def _numeric(self, op: int, st: list) -> None:  # noqa: C901
        if op == 0x6A:  # i32.add (hottest few first)
            b = st.pop()
            st[-1] = (st[-1] + b) & 0xFFFFFFFF
        elif op == 0x6B:  # i32.sub
            b = st.pop()
            st[-1] = (st[-1] - b) & 0xFFFFFFFF
        elif op == 0x6C:  # i32.mul
            b = st.pop()
            st[-1] = (st[-1] * b) & 0xFFFFFFFF
        elif op == 0x45:  # i32.eqz
            st[-1] = 1 if st[-1] == 0 else 0
        elif op == 0x46:  # i32.eq
            b = st.pop()
            st[-1] = 1 if st[-1] == b else 0
        elif op == 0x47:  # i32.ne
            b = st.pop()
            st[-1] = 1 if st[-1] != b else 0
        elif op == 0x48:  # i32.lt_s
            b = st.pop()
            st[-1] = 1 if _s32(st[-1]) < _s32(b) else 0
        elif op == 0x49:  # i32.lt_u
            b = st.pop()
            st[-1] = 1 if st[-1] < b else 0
        elif op == 0x4A:  # i32.gt_s
            b = st.pop()
            st[-1] = 1 if _s32(st[-1]) > _s32(b) else 0
        elif op == 0x4B:  # i32.gt_u
            b = st.pop()
            st[-1] = 1 if st[-1] > b else 0
        elif op == 0x4C:  # i32.le_s
            b = st.pop()
            st[-1] = 1 if _s32(st[-1]) <= _s32(b) else 0
        elif op == 0x4D:  # i32.le_u
            b = st.pop()
            st[-1] = 1 if st[-1] <= b else 0
        elif op == 0x4E:  # i32.ge_s
            b = st.pop()
            st[-1] = 1 if _s32(st[-1]) >= _s32(b) else 0
        elif op == 0x4F:  # i32.ge_u
            b = st.pop()
            st[-1] = 1 if st[-1] >= b else 0
        elif op == 0x6D:  # i32.div_s
            b = st.pop()
            st[-1] = _div_s(st[-1], b, 32)
        elif op == 0x6E:  # i32.div_u
            b = st.pop()
            if b == 0:
                raise WasmTrap("integer divide by zero")
            st[-1] = st[-1] // b
        elif op == 0x6F:  # i32.rem_s
            b = st.pop()
            st[-1] = _rem_s(st[-1], b, 32)
        elif op == 0x70:  # i32.rem_u
            b = st.pop()
            if b == 0:
                raise WasmTrap("integer divide by zero")
            st[-1] = st[-1] % b
        elif op == 0x71:  # i32.and
            b = st.pop()
            st[-1] &= b
        elif op == 0x72:  # i32.or
            b = st.pop()
            st[-1] |= b
        elif op == 0x73:  # i32.xor
            b = st.pop()
            st[-1] ^= b
        elif op == 0x74:  # i32.shl
            b = st.pop() % 32
            st[-1] = (st[-1] << b) & 0xFFFFFFFF
        elif op == 0x75:  # i32.shr_s
            b = st.pop() % 32
            st[-1] = (_s32(st[-1]) >> b) & 0xFFFFFFFF
        elif op == 0x76:  # i32.shr_u
            b = st.pop() % 32
            st[-1] >>= b
        elif op == 0x77:  # i32.rotl
            b = st.pop()
            st[-1] = _rotl(st[-1], b, 32)
        elif op == 0x78:  # i32.rotr
            b = st.pop()
            st[-1] = _rotl(st[-1], 32 - (b % 32), 32)
        elif op == 0x67:  # i32.clz
            v = st[-1]
            st[-1] = 32 - v.bit_length() if v else 32
        elif op == 0x68:  # i32.ctz
            v = st[-1]
            st[-1] = (v & -v).bit_length() - 1 if v else 32
        elif op == 0x69:  # i32.popcnt
            st[-1] = bin(st[-1]).count("1")
        # ---- i64
        elif op == 0x50:  # i64.eqz
            st[-1] = 1 if st[-1] == 0 else 0
        elif 0x51 <= op <= 0x5A:
            b = st.pop()
            a = st[-1]
            if op == 0x51:
                r = a == b
            elif op == 0x52:
                r = a != b
            elif op == 0x53:
                r = _s64(a) < _s64(b)
            elif op == 0x54:
                r = a < b
            elif op == 0x55:
                r = _s64(a) > _s64(b)
            elif op == 0x56:
                r = a > b
            elif op == 0x57:
                r = _s64(a) <= _s64(b)
            elif op == 0x58:
                r = a <= b
            elif op == 0x59:
                r = _s64(a) >= _s64(b)
            else:
                r = a >= b
            st[-1] = 1 if r else 0
        elif op == 0x79:  # i64.clz
            v = st[-1]
            st[-1] = 64 - v.bit_length() if v else 64
        elif op == 0x7A:
            v = st[-1]
            st[-1] = (v & -v).bit_length() - 1 if v else 64
        elif op == 0x7B:
            st[-1] = bin(st[-1]).count("1")
        elif 0x7C <= op <= 0x8A:
            b = st.pop()
            a = st[-1]
            M = 0xFFFFFFFFFFFFFFFF
            if op == 0x7C:
                st[-1] = (a + b) & M
            elif op == 0x7D:
                st[-1] = (a - b) & M
            elif op == 0x7E:
                st[-1] = (a * b) & M
            elif op == 0x7F:
                st[-1] = _div_s(a, b, 64)
            elif op == 0x80:
                if b == 0:
                    raise WasmTrap("integer divide by zero")
                st[-1] = a // b
            elif op == 0x81:
                st[-1] = _rem_s(a, b, 64)
            elif op == 0x82:
                if b == 0:
                    raise WasmTrap("integer divide by zero")
                st[-1] = a % b
            elif op == 0x83:
                st[-1] = a & b
            elif op == 0x84:
                st[-1] = a | b
            elif op == 0x85:
                st[-1] = a ^ b
            elif op == 0x86:
                st[-1] = (a << (b % 64)) & M
            elif op == 0x87:
                st[-1] = (_s64(a) >> (b % 64)) & M
            elif op == 0x88:
                st[-1] = a >> (b % 64)
            elif op == 0x89:
                st[-1] = _rotl(a, b, 64)
            else:
                st[-1] = _rotl(a, 64 - (b % 64), 64)
        # ---- float compares
        elif 0x5B <= op <= 0x66:
            b = st.pop()
            a = st[-1]
            k = (op - 0x5B) % 6
            if k == 0:
                r = a == b
            elif k == 1:
                r = a != b
            elif k == 2:
                r = a < b
            elif k == 3:
                r = a > b
            elif k == 4:
                r = a <= b
            else:
                r = a >= b
            st[-1] = 1 if r else 0
        # ---- f32 unary/binary
        elif 0x8B <= op <= 0x98:
            self._funop(op - 0x8B, st, True)
        elif 0x99 <= op <= 0xA6:
            self._funop(op - 0x99, st, False)
        # ---- conversions
        elif op == 0xA7:  # i32.wrap_i64
            st[-1] &= 0xFFFFFFFF
        elif op == 0xA8:
            st[-1] = _trunc(st[-1], -(2**31), 2**31 - 1, 0xFFFFFFFF, False)
        elif op == 0xA9:
            st[-1] = _trunc(st[-1], 0, 2**32 - 1, 0xFFFFFFFF, False)
        elif op == 0xAA:
            st[-1] = _trunc(st[-1], -(2**31), 2**31 - 1, 0xFFFFFFFF, False)
        elif op == 0xAB:
            st[-1] = _trunc(st[-1], 0, 2**32 - 1, 0xFFFFFFFF, False)
        elif op == 0xAC:  # i64.extend_i32_s
            st[-1] = _s32(st[-1]) & 0xFFFFFFFFFFFFFFFF
        elif op == 0xAD:  # i64.extend_i32_u
            pass
        elif op == 0xAE:
            st[-1] = _trunc(st[-1], -(2**63), 2**63 - 1, 2**64 - 1, False)
        elif op == 0xAF:
            st[-1] = _trunc(st[-1], 0, 2**64 - 1, 2**64 - 1, False)
        elif op == 0xB0:
            st[-1] = _trunc(st[-1], -(2**63), 2**63 - 1, 2**64 - 1, False)
        elif op == 0xB1:
            st[-1] = _trunc(st[-1], 0, 2**64 - 1, 2**64 - 1, False)
        elif op == 0xB2:  # f32.convert_i32_s
            st[-1] = _f32(float(_s32(st[-1])))
        elif op == 0xB3:
            st[-1] = _f32(float(st[-1]))
        elif op == 0xB4:
            st[-1] = _f32(float(_s64(st[-1])))
        elif op == 0xB5:
            st[-1] = _f32(float(st[-1]))
        elif op == 0xB6:  # f32.demote_f64
            st[-1] = _f32(st[-1])
        elif op == 0xB7:  # f64.convert_i32_s
            st[-1] = float(_s32(st[-1]))
        elif op == 0xB8:
            st[-1] = float(st[-1])
        elif op == 0xB9:
            st[-1] = float(_s64(st[-1]))
        elif op == 0xBA:
            st[-1] = float(st[-1])
        elif op == 0xBB:  # f64.promote_f32
            pass
        elif op == 0xBC:  # i32.reinterpret_f32
            st[-1] = struct.unpack("<I", struct.pack("<f", st[-1]))[0]
        elif op == 0xBD:
            st[-1] = struct.unpack("<Q", struct.pack("<d", st[-1]))[0]
        elif op == 0xBE:
            st[-1] = struct.unpack("<f", struct.pack("<I", st[-1]))[0]
        elif op == 0xBF:
            st[-1] = struct.unpack("<d", struct.pack("<Q", st[-1]))[0]
        # ---- sign extension
        elif op == 0xC0:  # i32.extend8_s
            st[-1] = (_s32(st[-1] & 0xFF | (0xFFFFFF00 if st[-1] & 0x80 else 0))) & 0xFFFFFFFF
        elif op == 0xC1:
            st[-1] = (st[-1] & 0xFFFF | (0xFFFF0000 if st[-1] & 0x8000 else 0)) & 0xFFFFFFFF
        elif op == 0xC2:  # i64.extend8_s
            v = st[-1] & 0xFF
            st[-1] = v | (0xFFFFFFFFFFFFFF00 if v & 0x80 else 0)
        elif op == 0xC3:
            v = st[-1] & 0xFFFF
            st[-1] = v | (0xFFFFFFFFFFFF0000 if v & 0x8000 else 0)
        elif op == 0xC4:
            v = st[-1] & 0xFFFFFFFF
            st[-1] = v | (0xFFFFFFFF00000000 if v & 0x80000000 else 0)
        # ---- 0xFC prefixed
        elif op == 0xFC00:
            st[-1] = _trunc(st[-1], -(2**31), 2**31 - 1, 0xFFFFFFFF, True)
        elif op == 0xFC01:
            st[-1] = _trunc(st[-1], 0, 2**32 - 1, 0xFFFFFFFF, True)
        elif op == 0xFC02:
            st[-1] = _trunc(st[-1], -(2**31), 2**31 - 1, 0xFFFFFFFF, True)
        elif op == 0xFC03:
            st[-1] = _trunc(st[-1], 0, 2**32 - 1, 0xFFFFFFFF, True)
        elif op == 0xFC04:
            st[-1] = _trunc(st[-1], -(2**63), 2**63 - 1, 2**64 - 1, True)
        elif op == 0xFC05:
            st[-1] = _trunc(st[-1], 0, 2**64 - 1, 2**64 - 1, True)
        elif op == 0xFC06:
            st[-1] = _trunc(st[-1], -(2**63), 2**63 - 1, 2**64 - 1, True)
        elif op == 0xFC07:
            st[-1] = _trunc(st[-1], 0, 2**64 - 1, 2**64 - 1, True)
        elif op == 0xFC0A:  # memory.copy
            n = st.pop()
            src = st.pop()
            dst = st.pop()
            m = self.memory
            if src + n > len(m) or dst + n > len(m):
                raise WasmTrap("out of bounds memory access")
            m[dst : dst + n] = m[src : src + n]
        elif op == 0xFC0B:  # memory.fill
            n = st.pop()
            val = st.pop() & 0xFF
            dst = st.pop()
            m = self.memory
            if dst + n > len(m):
                raise WasmTrap("out of bounds memory access")
            m[dst : dst + n] = bytes([val]) * n
        elif op == 0xFC08:  # memory.init (passive segment)
            n = st.pop()
            src = st.pop()
            dst = st.pop()
            raise WasmTrap("memory.init: passive segments unsupported")
        elif op == 0xFC09:  # data.drop
            pass
        else:
            raise WasmTrap(f"unhandled numeric opcode 0x{op:02x}")

    def _funop(self, k: int, st: list, is32: bool) -> None:
        rnd = _f32 if is32 else (lambda x: x)
        if k <= 6:  # unary: abs neg ceil floor trunc nearest sqrt
            v = st[-1]
            if k == 0:
                r = abs(v)
            elif k == 1:
                r = -v
            elif k == 2:
                r = float(math.ceil(v)) if math.isfinite(v) else v
            elif k == 3:
                r = float(math.floor(v)) if math.isfinite(v) else v
            elif k == 4:
                r = float(math.trunc(v)) if math.isfinite(v) else v
            elif k == 5:
                r = _nearest(v) if math.isfinite(v) else v
            else:
                if v < 0:
                    r = math.nan
                else:
                    r = math.sqrt(v)
            st[-1] = rnd(r)
        else:  # binary: add sub mul div min max copysign
            b = st.pop()
            a = st[-1]
            if k == 7:
                r = a + b
            elif k == 8:
                r = a - b
            elif k == 9:
                r = a * b
            elif k == 10:
                if b == 0:
                    if a == 0 or math.isnan(a):
                        r = math.nan
                    else:
                        r = math.copysign(math.inf, a) * math.copysign(1, b)
                else:
                    r = a / b
            elif k == 11:
                r = math.nan if (math.isnan(a) or math.isnan(b)) else min(a, b)
            elif k == 12:
                r = math.nan if (math.isnan(a) or math.isnan(b)) else max(a, b)
            else:
                r = math.copysign(a, b)
            st[-1] = rnd(r)
