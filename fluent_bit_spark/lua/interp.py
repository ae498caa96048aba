"""Lua 5.1 tree-walking interpreter (public spec, lua.org/manual/5.1).

Runs the scripts fluent-bit's filter_lua plugin accepts (reference
plugins/filter_lua/lua.c embeds LuaJIT/Lua 5.1): closures, tables with
metatables (__index/__newindex/__call), multiple return values,
varargs, and the string/table/math/os library subset those scripts use
— including full Lua pattern matching via
:mod:`fluent_bit_spark.lua.patterns`.

Determinism notes (Spark oracle requirements):
- ``pairs`` iterates in table insertion order (Lua leaves it
  unspecified; a fixed order keeps record round-trips reproducible).
- ``os.time`` is an injectable hook (default 0) so rate-limit-style
  scripts are testable.
- ``math.random`` is a seeded LCG (Lua leaves the RNG
  implementation-defined).
"""

from __future__ import annotations

import math as _pymath
from typing import Any, Callable

from . import patterns
from .parser import parse


class LuaError(Exception):
    """Runtime error carrying a Lua value (usually a message string)."""

    def __init__(self, value: Any, level: int = 1):
        self.value = value
        super().__init__(lua_tostring(value))


class _Break(Exception):
    pass


class _Return(Exception):
    def __init__(self, values: list):
        self.values = values


_TRUE_KEY = ("\0bool", True)
_FALSE_KEY = ("\0bool", False)


def _normkey(k: Any) -> Any:
    """Normalize a Lua value for use as a Python dict key.
    Numbers: 1.0 and 1 are the same key. Booleans must not collide with
    numbers (Python hashes True == 1), so they get sentinel keys."""
    if k is None:
        raise LuaError("table index is nil")
    if isinstance(k, bool):
        return _TRUE_KEY if k else _FALSE_KEY
    if isinstance(k, float):
        if _pymath.isnan(k):
            raise LuaError("table index is NaN")
        if k.is_integer():
            return int(k)
        return k
    if isinstance(k, int):
        return k
    return k


def _denormkey(k: Any) -> Any:
    if k is _TRUE_KEY or (isinstance(k, tuple) and k == _TRUE_KEY):
        return True
    if k is _FALSE_KEY or (isinstance(k, tuple) and k == _FALSE_KEY):
        return False
    if isinstance(k, int) and not isinstance(k, bool):
        return float(k)
    return k


class LuaTable:
    """Lua table: one ordered dict; `#` is a border per the 5.1 spec."""

    __slots__ = ("data", "metatable")

    def __init__(self):
        self.data: dict = {}
        self.metatable: LuaTable | None = None

    def raw_get(self, key: Any) -> Any:
        return self.data.get(_normkey(key))

    def raw_set(self, key: Any, value: Any) -> None:
        nk = _normkey(key)
        if value is None:
            self.data.pop(nk, None)
        else:
            self.data[nk] = value

    def length(self) -> float:
        n = 0
        while (n + 1) in self.data:
            n += 1
        return float(n)

    def lua_pairs(self):
        for k, v in list(self.data.items()):
            yield _denormkey(k), v


LuaCallable = Callable[..., list]


class LuaFunction:
    __slots__ = ("params", "is_vararg", "body", "env", "name")

    def __init__(self, params, is_vararg, body, env, name="?"):
        self.params = params
        self.is_vararg = is_vararg
        self.body = body
        self.env = env
        self.name = name


class Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent: "Env | None" = None):
        self.vars: dict = {}
        self.parent = parent

    def lookup(self, name: str) -> "Env | None":
        e: Env | None = self
        while e is not None:
            if name in e.vars:
                return e
            e = e.parent
        return None


def lua_tostring(v: Any) -> str:
    if v is None:
        return "nil"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        return fmt_number(v)
    if isinstance(v, str):
        return v
    if isinstance(v, LuaTable):
        return f"table: 0x{id(v):012x}"
    if isinstance(v, LuaFunction) or callable(v):
        return f"function: 0x{id(v):012x}"
    return str(v)


def fmt_number(v: float) -> str:
    """Lua 5.1 LUAI_NUMFMT: %.14g."""
    if v != v:
        return "nan"
    if v == _pymath.inf:
        return "inf"
    if v == -_pymath.inf:
        return "-inf"
    return "%.14g" % v


def lua_tonumber(v: Any, base: float | None = None) -> float | None:
    if base is not None and base != 10:
        if not isinstance(v, str):
            return None
        try:
            return float(int(v.strip(), int(base)))
        except ValueError:
            return None
    if isinstance(v, bool):
        return None
    if isinstance(v, float):
        return v
    if isinstance(v, int):
        return float(v)
    if isinstance(v, str):
        s = v.strip()
        try:
            if s.lower().startswith(("0x", "-0x")):
                return float(int(s, 16))
            return float(s)
        except ValueError:
            return None
    return None


def lua_type(v: Any) -> str:
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (float, int)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, LuaTable):
        return "table"
    return "function"


def _truthy(v: Any) -> bool:
    return v is not None and v is not False


class Interpreter:
    """One interpreter = one global state (like one lua_State)."""

    def __init__(self, os_time: Callable[[], float] | None = None):
        self.globals = LuaTable()
        self.output: list[str] = []
        self.os_time = os_time or (lambda: 0.0)
        self._rand_state = 42
        self.max_steps = 50_000_000  # runaway-script guard
        self._steps = 0
        self.string_lib = LuaTable()
        _install_stdlib(self)

    # -- public API -----------------------------------------------------
    def run(self, source: str) -> list:
        """Execute a chunk; returns the chunk's return values."""
        body = parse(source)
        env = Env()
        try:
            self.exec_block(body, env)
        except _Return as r:
            return r.values
        return []

    def run_ast(self, body: list) -> list:
        env = Env()
        try:
            self.exec_block(body, env)
        except _Return as r:
            return r.values
        return []

    def get_global(self, name: str) -> Any:
        return self.globals.raw_get(name)

    def call(self, fn: Any, args: list) -> list:
        return self.call_function(fn, args)

    # -- execution -------------------------------------------------------
    def exec_block(self, block: list, env: Env) -> None:
        for stmt in block:
            self.exec_stmt(stmt, env)

    def exec_stmt(self, stmt, env: Env) -> None:
        self._steps += 1
        if self._steps > self.max_steps:
            raise LuaError("script exceeded execution step budget")
        op = stmt[0]
        if op == "local":
            _, names, exprs = stmt
            vals = self.eval_multi(exprs, env)
            for i, n in enumerate(names):
                env.vars[n] = vals[i] if i < len(vals) else None
        elif op == "assign":
            _, targets, exprs = stmt
            vals = self.eval_multi(exprs, env)
            for i, tgt in enumerate(targets):
                v = vals[i] if i < len(vals) else None
                self.assign(tgt, v, env)
        elif op == "callstat":
            self.eval_call(stmt[1], env)
        elif op == "if":
            _, arms, else_block = stmt
            for cond, body in arms:
                if _truthy(self.eval(cond, env)):
                    self.exec_block(body, Env(env))
                    return
            if else_block is not None:
                self.exec_block(else_block, Env(env))
        elif op == "while":
            _, cond, body = stmt
            while _truthy(self.eval(cond, env)):
                try:
                    self.exec_block(body, Env(env))
                except _Break:
                    break
        elif op == "repeat":
            _, body, cond = stmt
            while True:
                scope = Env(env)
                try:
                    self.exec_block(body, scope)
                except _Break:
                    break
                # until sees the loop body's locals (5.1 scoping rule)
                if _truthy(self.eval(cond, scope)):
                    break
        elif op == "fornum":
            _, var, e_start, e_stop, e_step, body = stmt
            v = self._fornum_number(self.eval(e_start, env), "initial")
            stop = self._fornum_number(self.eval(e_stop, env), "limit")
            step = (
                self._fornum_number(self.eval(e_step, env), "step")
                if e_step is not None
                else 1.0
            )
            if step == 0:
                raise LuaError("'for' step is zero")
            try:
                while (step > 0 and v <= stop) or (step < 0 and v >= stop):
                    scope = Env(env)
                    scope.vars[var] = v
                    self.exec_block(body, scope)
                    v += step
            except _Break:
                pass
        elif op == "forin":
            _, names, exprs, body = stmt
            vals = self.eval_multi(exprs, env)
            f = vals[0] if len(vals) > 0 else None
            s = vals[1] if len(vals) > 1 else None
            ctrl = vals[2] if len(vals) > 2 else None
            try:
                while True:
                    rets = self.call_function(f, [s, ctrl])
                    first = rets[0] if rets else None
                    if first is None:
                        break
                    ctrl = first
                    scope = Env(env)
                    for i, n in enumerate(names):
                        scope.vars[n] = rets[i] if i < len(rets) else None
                    self.exec_block(body, scope)
            except _Break:
                pass
        elif op == "localfunc":
            _, name, fexpr = stmt
            env.vars[name] = None  # visible to its own body (recursion)
            fn = LuaFunction(fexpr[1], fexpr[2], fexpr[3], env, name)
            env.vars[name] = fn
        elif op == "return":
            raise _Return(self.eval_multi(stmt[1], env))
        elif op == "break":
            raise _Break()
        elif op == "do":
            self.exec_block(stmt[1], Env(env))
        else:  # pragma: no cover
            raise LuaError(f"unknown statement {op}")

    @staticmethod
    def _fornum_number(v: Any, what: str) -> float:
        n = lua_tonumber(v)
        if n is None:
            raise LuaError(f"'for' {what} value must be a number")
        return n

    def assign(self, tgt, value: Any, env: Env) -> None:
        if tgt[0] == "name":
            name = tgt[1]
            scope = env.lookup(name)
            if scope is not None:
                scope.vars[name] = value
            else:
                self.globals.raw_set(name, value)
        elif tgt[0] == "index":
            obj = self.eval(tgt[1], env)
            key = self.eval(tgt[2], env)
            self.setindex(obj, key, value)
        else:
            raise LuaError("cannot assign to this expression")

    def setindex(self, obj: Any, key: Any, value: Any) -> None:
        if isinstance(obj, LuaTable):
            if obj.metatable is not None and obj.raw_get(key) is None:
                h = obj.metatable.raw_get("__newindex")
                if h is not None:
                    if isinstance(h, LuaTable):
                        self.setindex(h, key, value)
                    else:
                        self.call_function(h, [obj, key, value])
                    return
            obj.raw_set(key, value)
            return
        raise LuaError(f"attempt to index a {lua_type(obj)} value")

    def getindex(self, obj: Any, key: Any) -> Any:
        if isinstance(obj, LuaTable):
            v = obj.raw_get(key)
            if v is None and obj.metatable is not None:
                h = obj.metatable.raw_get("__index")
                if h is not None:
                    if isinstance(h, LuaTable):
                        return self.getindex(h, key)
                    return _first(self.call_function(h, [obj, key]))
            return v
        if isinstance(obj, str):
            # strings share the string library as methods: s:upper() etc.
            return self.string_lib.raw_get(key)
        raise LuaError(f"attempt to index a {lua_type(obj)} value")

    # -- evaluation --------------------------------------------------------
    def eval(self, e, env: Env) -> Any:
        op = e[0]
        if op == "num":
            return float(e[1])
        if op == "str":
            return e[1]
        if op == "nil":
            return None
        if op == "true":
            return True
        if op == "false":
            return False
        if op == "name":
            scope = env.lookup(e[1])
            if scope is not None:
                return scope.vars[e[1]]
            return self.globals.raw_get(e[1])
        if op == "paren":
            return self.eval(e[1], env)
        if op == "index":
            return self.getindex(self.eval(e[1], env), self.eval(e[2], env))
        if op in ("call", "method"):
            return _first(self.eval_call(e, env))
        if op == "vararg":
            scope = env.lookup("...")
            va = scope.vars["..."] if scope else []
            return va[0] if va else None
        if op == "and":
            left = self.eval(e[1], env)
            return self.eval(e[2], env) if _truthy(left) else left
        if op == "or":
            left = self.eval(e[1], env)
            return left if _truthy(left) else self.eval(e[2], env)
        if op == "binop":
            return self.eval_binop(e[1], e[2], e[3], env)
        if op == "unop":
            return self.eval_unop(e[1], e[2], env)
        if op == "func":
            return LuaFunction(e[1], e[2], e[3], env)
        if op == "table":
            return self.eval_table(e[1], env)
        raise LuaError(f"unknown expression {op}")  # pragma: no cover

    def eval_table(self, fields, env: Env) -> LuaTable:
        t = LuaTable()
        arr_i = 0
        last = len(fields) - 1
        for i, f in enumerate(fields):
            if f[0] == "kv":
                t.raw_set(self.eval(f[1], env), self.eval(f[2], env))
            else:
                e = f[1]
                if i == last and e[0] in ("call", "method", "vararg"):
                    for v in self.eval_expr_multi(e, env):
                        arr_i += 1
                        t.raw_set(float(arr_i), v)
                else:
                    arr_i += 1
                    t.raw_set(float(arr_i), self.eval(e, env))
        return t

    def eval_multi(self, exprs: list, env: Env) -> list:
        """Evaluate an expression list; the LAST expression expands if it
        is a call or vararg (Lua multiple-value semantics)."""
        if not exprs:
            return []
        out = [self.eval(e, env) for e in exprs[:-1]]
        out.extend(self.eval_expr_multi(exprs[-1], env))
        return out

    def eval_expr_multi(self, e, env: Env) -> list:
        if e[0] in ("call", "method"):
            return self.eval_call(e, env)
        if e[0] == "vararg":
            scope = env.lookup("...")
            return list(scope.vars["..."]) if scope else []
        return [self.eval(e, env)]

    def eval_call(self, e, env: Env) -> list:
        if e[0] == "call":
            fn = self.eval(e[1], env)
            args = self.eval_multi(e[2], env)
        else:  # method
            obj = self.eval(e[1], env)
            fn = self.getindex(obj, e[2])
            args = [obj] + self.eval_multi(e[3], env)
        return self.call_function(fn, args)

    def call_function(self, fn: Any, args: list) -> list:
        self._steps += 1
        if self._steps > self.max_steps:
            raise LuaError("script exceeded execution step budget")
        if isinstance(fn, LuaFunction):
            scope = Env(fn.env)
            for i, p in enumerate(fn.params):
                scope.vars[p] = args[i] if i < len(args) else None
            if fn.is_vararg:
                scope.vars["..."] = args[len(fn.params):]
            try:
                self.exec_block(fn.body, scope)
            except _Return as r:
                return r.values
            return []
        if callable(fn):
            return fn(self, args)
        if isinstance(fn, LuaTable) and fn.metatable is not None:
            h = fn.metatable.raw_get("__call")
            if h is not None:
                return self.call_function(h, [fn] + args)
        raise LuaError(f"attempt to call a {lua_type(fn)} value")

    # -- operators ---------------------------------------------------------
    def eval_binop(self, op: str, le, re_, env: Env) -> Any:
        lv = self.eval(le, env)
        rv = self.eval(re_, env)
        if op in ("+", "-", "*", "/", "%", "^"):
            ln, rn = lua_tonumber(lv), lua_tonumber(rv)
            if ln is None or rn is None:
                bad = lv if ln is None else rv
                raise LuaError(
                    f"attempt to perform arithmetic on a {lua_type(bad)} value"
                )
            if op == "+":
                return ln + rn
            if op == "-":
                return ln - rn
            if op == "*":
                return ln * rn
            if op == "/":
                if rn == 0:
                    return _pymath.inf if ln > 0 else (-_pymath.inf if ln < 0 else _pymath.nan)
                return ln / rn
            if op == "%":
                # Lua: a - floor(a/b)*b
                if rn == 0:
                    return _pymath.nan
                return ln - _pymath.floor(ln / rn) * rn
            if op == "^":
                return float(ln**rn)
        if op == "..":
            if isinstance(lv, (float, int)) and not isinstance(lv, bool):
                lv = fmt_number(float(lv))
            if isinstance(rv, (float, int)) and not isinstance(rv, bool):
                rv = fmt_number(float(rv))
            if isinstance(lv, str) and isinstance(rv, str):
                return lv + rv
            bad = rv if isinstance(lv, str) else lv
            raise LuaError(f"attempt to concatenate a {lua_type(bad)} value")
        if op == "==":
            return self._lua_eq(lv, rv)
        if op == "~=":
            return not self._lua_eq(lv, rv)
        if op in ("<", "<=", ">", ">="):
            if (
                isinstance(lv, (float, int))
                and not isinstance(lv, bool)
                and isinstance(rv, (float, int))
                and not isinstance(rv, bool)
            ) or (isinstance(lv, str) and isinstance(rv, str)):
                if op == "<":
                    return lv < rv
                if op == "<=":
                    return lv <= rv
                if op == ">":
                    return lv > rv
                return lv >= rv
            raise LuaError(
                f"attempt to compare {lua_type(lv)} with {lua_type(rv)}"
            )
        raise LuaError(f"unknown operator {op}")  # pragma: no cover

    @staticmethod
    def _lua_eq(a: Any, b: Any) -> bool:
        ta, tb = lua_type(a), lua_type(b)
        if ta != tb:
            return False
        if ta == "table" or ta == "function":
            return a is b
        return a == b

    def eval_unop(self, op: str, e, env: Env) -> Any:
        v = self.eval(e, env)
        if op == "-":
            n = lua_tonumber(v)
            if n is None:
                raise LuaError(
                    f"attempt to perform arithmetic on a {lua_type(v)} value"
                )
            return -n
        if op == "not":
            return not _truthy(v)
        if op == "#":
            if isinstance(v, str):
                return float(len(v))
            if isinstance(v, LuaTable):
                return v.length()
            raise LuaError(f"attempt to get length of a {lua_type(v)} value")
        raise LuaError(f"unknown unary {op}")  # pragma: no cover


def _first(values: list) -> Any:
    return values[0] if values else None


# ---------------------------------------------------------------------------
# Standard library
# ---------------------------------------------------------------------------


def _arg(args: list, i: int, default: Any = None) -> Any:
    return args[i] if i < len(args) else default


def _checknum(v: Any, fname: str, n: int) -> float:
    x = lua_tonumber(v)
    if x is None:
        raise LuaError(f"bad argument #{n} to '{fname}' (number expected)")
    return x


def _checkstr(v: Any, fname: str, n: int) -> str:
    if isinstance(v, str):
        return v
    if isinstance(v, (float, int)) and not isinstance(v, bool):
        return fmt_number(float(v))
    raise LuaError(f"bad argument #{n} to '{fname}' (string expected)")


def _checktable(v: Any, fname: str, n: int) -> LuaTable:
    if not isinstance(v, LuaTable):
        raise LuaError(f"bad argument #{n} to '{fname}' (table expected)")
    return v


def _str_index(s_len: int, i: float, default: int) -> int:
    """Lua 1-based string index → Python offset (for sub/find init)."""
    i = int(i) if i is not None else default
    if i < 0:
        i = max(s_len + i + 1, 1)
    elif i == 0:
        i = 1
    return i


def _install_stdlib(interp: Interpreter) -> None:
    g = interp.globals

    # ---- basic -----------------------------------------------------------
    def _print(it: Interpreter, args: list) -> list:
        it.output.append("\t".join(_tostring_one(it, a) for a in args))
        return []

    def _tostring_one(it: Interpreter, v: Any) -> str:
        if isinstance(v, LuaTable) and v.metatable is not None:
            h = v.metatable.raw_get("__tostring")
            if h is not None:
                return _checkstr(_first(it.call_function(h, [v])), "tostring", 1)
        return lua_tostring(v)

    def _tostring(it: Interpreter, args: list) -> list:
        return [_tostring_one(it, _arg(args, 0))]

    def _tonumber(it: Interpreter, args: list) -> list:
        base = _arg(args, 1)
        return [lua_tonumber(_arg(args, 0), lua_tonumber(base) if base is not None else None)]

    def _type(it: Interpreter, args: list) -> list:
        if not args:
            raise LuaError("bad argument #1 to 'type' (value expected)")
        return [lua_type(args[0])]

    def _next_impl(t: LuaTable, key: Any) -> list:
        it = t.lua_pairs()
        if key is None:
            for k, v in it:
                return [k, v]
            return [None]
        seen = False
        nk = _normkey(key)
        for k, v in t.lua_pairs():
            if seen:
                return [k, v]
            if _normkey(k) == nk:
                seen = True
        if seen:
            return [None]
        raise LuaError("invalid key to 'next'")

    def _next(it: Interpreter, args: list) -> list:
        t = _checktable(_arg(args, 0), "next", 1)
        return _next_impl(t, _arg(args, 1))

    def _pairs(it: Interpreter, args: list) -> list:
        t = _checktable(_arg(args, 0), "pairs", 1)
        # stateful iterator over a snapshot, insertion-ordered
        items = list(t.lua_pairs())
        state = {"i": 0}

        def step(it2: Interpreter, a: list) -> list:
            i = state["i"]
            if i >= len(items):
                return [None]
            state["i"] = i + 1
            k, v = items[i]
            return [k, v]

        return [step, t, None]

    def _ipairs(it: Interpreter, args: list) -> list:
        t = _checktable(_arg(args, 0), "ipairs", 1)

        def step(it2: Interpreter, a: list) -> list:
            tt, i = a[0], a[1] + 1
            v = tt.raw_get(i)
            if v is None:
                return [None]
            return [i, v]

        return [step, t, 0.0]

    def _select(it: Interpreter, args: list) -> list:
        n = _arg(args, 0)
        rest = args[1:]
        if n == "#":
            return [float(len(rest))]
        i = int(_checknum(n, "select", 1))
        if i < 0:
            i = len(rest) + i + 1
        if i < 1:
            raise LuaError("bad argument #1 to 'select' (index out of range)")
        return rest[i - 1 :]

    def _unpack(it: Interpreter, args: list) -> list:
        t = _checktable(_arg(args, 0), "unpack", 1)
        i = int(_checknum(_arg(args, 1, 1.0), "unpack", 2))
        j_arg = _arg(args, 2)
        j = int(_checknum(j_arg, "unpack", 3)) if j_arg is not None else int(t.length())
        return [t.raw_get(float(k)) for k in range(i, j + 1)]

    def _error(it: Interpreter, args: list) -> list:
        raise LuaError(_arg(args, 0))

    def _assert(it: Interpreter, args: list) -> list:
        if not _truthy(_arg(args, 0)):
            raise LuaError(_arg(args, 1, "assertion failed!"))
        return args

    def _pcall(it: Interpreter, args: list) -> list:
        if not args:
            raise LuaError("bad argument #1 to 'pcall' (value expected)")
        try:
            return [True] + it.call_function(args[0], args[1:])
        except LuaError as exc:
            return [False, exc.value]
        except ZeroDivisionError:
            return [False, "attempt to perform arithmetic (divide by zero)"]

    def _rawget(it: Interpreter, args: list) -> list:
        return [_checktable(_arg(args, 0), "rawget", 1).raw_get(_arg(args, 1))]

    def _rawset(it: Interpreter, args: list) -> list:
        t = _checktable(_arg(args, 0), "rawset", 1)
        t.raw_set(_arg(args, 1), _arg(args, 2))
        return [t]

    def _rawequal(it: Interpreter, args: list) -> list:
        a, b = _arg(args, 0), _arg(args, 1)
        if isinstance(a, LuaTable) or isinstance(b, LuaTable):
            return [a is b]
        return [Interpreter._lua_eq(a, b)]

    def _setmetatable(it: Interpreter, args: list) -> list:
        t = _checktable(_arg(args, 0), "setmetatable", 1)
        mt = _arg(args, 1)
        if mt is not None and not isinstance(mt, LuaTable):
            raise LuaError("bad argument #2 to 'setmetatable' (nil or table expected)")
        t.metatable = mt
        return [t]

    def _getmetatable(it: Interpreter, args: list) -> list:
        v = _arg(args, 0)
        if isinstance(v, LuaTable):
            return [v.metatable]
        return [None]

    g.raw_set("print", _print)
    g.raw_set("tostring", _tostring)
    g.raw_set("tonumber", _tonumber)
    g.raw_set("type", _type)
    g.raw_set("next", _next)
    g.raw_set("pairs", _pairs)
    g.raw_set("ipairs", _ipairs)
    g.raw_set("select", _select)
    g.raw_set("unpack", _unpack)
    g.raw_set("error", _error)
    g.raw_set("assert", _assert)
    g.raw_set("pcall", _pcall)
    g.raw_set("rawget", _rawget)
    g.raw_set("rawset", _rawset)
    g.raw_set("rawequal", _rawequal)
    g.raw_set("setmetatable", _setmetatable)
    g.raw_set("getmetatable", _getmetatable)

    # ---- string ------------------------------------------------------------
    s = interp.string_lib

    def _s_len(it, args):
        return [float(len(_checkstr(_arg(args, 0), "len", 1)))]

    def _s_sub(it, args):
        st = _checkstr(_arg(args, 0), "sub", 1)
        n = len(st)
        i = int(_checknum(_arg(args, 1, 1.0), "sub", 2))
        j_arg = _arg(args, 2)
        j = int(_checknum(j_arg, "sub", 3)) if j_arg is not None else -1
        if i < 0:
            i = max(n + i + 1, 1)
        elif i == 0:
            i = 1
        if j < 0:
            j = n + j + 1
        elif j > n:
            j = n
        if i > j:
            return [""]
        return [st[i - 1 : j]]

    def _s_upper(it, args):
        return [_checkstr(_arg(args, 0), "upper", 1).upper()]

    def _s_lower(it, args):
        return [_checkstr(_arg(args, 0), "lower", 1).lower()]

    def _s_rep(it, args):
        st = _checkstr(_arg(args, 0), "rep", 1)
        n = int(_checknum(_arg(args, 1), "rep", 2))
        return [st * max(n, 0)]

    def _s_reverse(it, args):
        return [_checkstr(_arg(args, 0), "reverse", 1)[::-1]]

    def _s_byte(it, args):
        st = _checkstr(_arg(args, 0), "byte", 1)
        i = int(_checknum(_arg(args, 1, 1.0), "byte", 2))
        j_arg = _arg(args, 2)
        j = int(_checknum(j_arg, "byte", 3)) if j_arg is not None else i
        n = len(st)
        if i < 0:
            i = n + i + 1
        if j < 0:
            j = n + j + 1
        i = max(i, 1)
        j = min(j, n)
        return [float(ord(c)) for c in st[i - 1 : j]]

    def _s_char(it, args):
        return ["".join(chr(int(_checknum(a, "char", i + 1))) for i, a in enumerate(args))]

    def _s_format(it, args):
        fmt = _checkstr(_arg(args, 0), "format", 1)
        return [_lua_format(it, fmt, args[1:])]

    def _s_find(it, args):
        st = _checkstr(_arg(args, 0), "find", 1)
        pat = _checkstr(_arg(args, 1), "find", 2)
        init = _str_index(len(st), _arg(args, 2), 1)
        plain = _truthy(_arg(args, 3))
        start0 = min(init - 1, len(st))
        if plain:
            idx = st.find(pat, start0)
            if idx < 0:
                return [None]
            return [float(idx + 1), float(idx + len(pat))]
        r = patterns.find(st, pat, start0)
        if r is None:
            return [None]
        s0, e0, caps = r
        out: list = [float(s0 + 1), float(e0)]
        # captures appended only if the pattern has explicit captures
        if "(" in pat.replace("%(", ""):
            out.extend(caps)
        return out

    def _s_match(it, args):
        st = _checkstr(_arg(args, 0), "match", 1)
        pat = _checkstr(_arg(args, 1), "match", 2)
        init = _str_index(len(st), _arg(args, 2), 1)
        r = patterns.find(st, pat, min(init - 1, len(st)))
        if r is None:
            return [None]
        _, _, caps = r
        return caps

    def _s_gmatch(it, args):
        st = _checkstr(_arg(args, 0), "gmatch", 1)
        pat = _checkstr(_arg(args, 1), "gmatch", 2)
        state = {"pos": 0}

        def step(it2, a):
            while state["pos"] <= len(st):
                r = patterns.find(st, pat, state["pos"])
                if r is None:
                    return [None]
                s0, e0, caps = r
                state["pos"] = e0 + 1 if e0 == s0 else e0  # avoid empty-match loop
                return caps
            return [None]

        return [step]

    def _s_gsub(it, args):
        st = _checkstr(_arg(args, 0), "gsub", 1)
        pat = _checkstr(_arg(args, 1), "gsub", 2)
        repl = _arg(args, 2)
        max_n_arg = _arg(args, 3)
        max_n = int(_checknum(max_n_arg, "gsub", 4)) if max_n_arg is not None else -1
        out: list[str] = []
        pos = 0
        count = 0
        while pos <= len(st) and (max_n < 0 or count < max_n):
            r = patterns.find(st, pat, pos)
            if r is None:
                break
            s0, e0, caps = r
            out.append(st[pos:s0])
            whole = st[s0:e0]
            if isinstance(repl, str):
                rep = _gsub_str_repl(repl, whole, caps)
            elif isinstance(repl, LuaTable):
                rep = repl.raw_get(caps[0])
            elif repl is None:
                rep = None
            else:
                rep = _first(it.call_function(repl, list(caps)))
            if rep is None or rep is False:
                rep = whole
            elif isinstance(rep, (float, int)) and not isinstance(rep, bool):
                rep = fmt_number(float(rep))
            elif not isinstance(rep, str):
                raise LuaError("invalid replacement value (a " + lua_type(rep) + ")")
            out.append(rep)
            count += 1
            if e0 == s0:  # empty match: copy one char and advance
                if s0 < len(st):
                    out.append(st[s0])
                pos = s0 + 1
            else:
                pos = e0
        out.append(st[pos:])
        return ["".join(out), float(count)]

    s.raw_set("len", _s_len)
    s.raw_set("sub", _s_sub)
    s.raw_set("upper", _s_upper)
    s.raw_set("lower", _s_lower)
    s.raw_set("rep", _s_rep)
    s.raw_set("reverse", _s_reverse)
    s.raw_set("byte", _s_byte)
    s.raw_set("char", _s_char)
    s.raw_set("format", _s_format)
    s.raw_set("find", _s_find)
    s.raw_set("match", _s_match)
    s.raw_set("gmatch", _s_gmatch)
    s.raw_set("gsub", _s_gsub)
    g.raw_set("string", s)

    # ---- table ---------------------------------------------------------------
    t_lib = LuaTable()

    def _t_insert(it, args):
        t = _checktable(_arg(args, 0), "insert", 1)
        n = int(t.length())
        if len(args) >= 3:
            pos = int(_checknum(args[1], "insert", 2))
            # shift up
            for k in range(n, pos - 1, -1):
                t.raw_set(float(k + 1), t.raw_get(float(k)))
            t.raw_set(float(pos), args[2])
        else:
            t.raw_set(float(n + 1), _arg(args, 1))
        return []

    def _t_remove(it, args):
        t = _checktable(_arg(args, 0), "remove", 1)
        n = int(t.length())
        pos = int(_checknum(_arg(args, 1, float(n)), "remove", 2)) if len(args) >= 2 else n
        if n == 0:
            return [None]
        v = t.raw_get(float(pos))
        for k in range(pos, n):
            t.raw_set(float(k), t.raw_get(float(k + 1)))
        t.raw_set(float(n), None)
        return [v]

    def _t_concat(it, args):
        t = _checktable(_arg(args, 0), "concat", 1)
        sep = _arg(args, 1, "")
        sep = _checkstr(sep, "concat", 2) if sep != "" else ""
        i = int(_checknum(_arg(args, 2, 1.0), "concat", 3))
        j_arg = _arg(args, 3)
        j = int(_checknum(j_arg, "concat", 4)) if j_arg is not None else int(t.length())
        parts = []
        for k in range(i, j + 1):
            v = t.raw_get(float(k))
            if isinstance(v, str):
                parts.append(v)
            elif isinstance(v, (float, int)) and not isinstance(v, bool):
                parts.append(fmt_number(float(v)))
            else:
                raise LuaError(f"invalid value (at index {k}) in table for 'concat'")
        return [sep.join(parts)]

    def _t_sort(it, args):
        t = _checktable(_arg(args, 0), "sort", 1)
        n = int(t.length())
        items = [t.raw_get(float(k)) for k in range(1, n + 1)]
        cmp = _arg(args, 1)
        if cmp is not None:
            import functools

            def pycmp(a, b):
                if _truthy(_first(it.call_function(cmp, [a, b]))):
                    return -1
                if _truthy(_first(it.call_function(cmp, [b, a]))):
                    return 1
                return 0

            items.sort(key=functools.cmp_to_key(pycmp))
        else:
            items.sort()
        for k, v in enumerate(items, 1):
            t.raw_set(float(k), v)
        return []

    def _t_getn(it, args):
        return [_checktable(_arg(args, 0), "getn", 1).length()]

    t_lib.raw_set("insert", _t_insert)
    t_lib.raw_set("remove", _t_remove)
    t_lib.raw_set("concat", _t_concat)
    t_lib.raw_set("sort", _t_sort)
    t_lib.raw_set("getn", _t_getn)
    g.raw_set("table", t_lib)

    # ---- math --------------------------------------------------------------
    m = LuaTable()

    def _wrap1(f, name):
        def fn(it, args):
            return [float(f(_checknum(_arg(args, 0), name, 1)))]

        return fn

    m.raw_set("floor", _wrap1(_pymath.floor, "floor"))
    m.raw_set("ceil", _wrap1(_pymath.ceil, "ceil"))
    m.raw_set("abs", _wrap1(abs, "abs"))
    m.raw_set("sqrt", _wrap1(_pymath.sqrt, "sqrt"))
    m.raw_set("exp", _wrap1(_pymath.exp, "exp"))
    m.raw_set("log", _wrap1(_pymath.log, "log"))
    m.raw_set("log10", _wrap1(_pymath.log10, "log10"))
    m.raw_set("sin", _wrap1(_pymath.sin, "sin"))
    m.raw_set("cos", _wrap1(_pymath.cos, "cos"))
    m.raw_set("tan", _wrap1(_pymath.tan, "tan"))
    m.raw_set("huge", _pymath.inf)
    m.raw_set("pi", _pymath.pi)

    def _m_max(it, args):
        return [max(_checknum(a, "max", i + 1) for i, a in enumerate(args))]

    def _m_min(it, args):
        return [min(_checknum(a, "min", i + 1) for i, a in enumerate(args))]

    def _m_fmod(it, args):
        a = _checknum(_arg(args, 0), "fmod", 1)
        b = _checknum(_arg(args, 1), "fmod", 2)
        return [_pymath.fmod(a, b)]

    def _m_pow(it, args):
        a = _checknum(_arg(args, 0), "pow", 1)
        b = _checknum(_arg(args, 1), "pow", 2)
        return [float(a**b)]

    def _m_modf(it, args):
        a = _checknum(_arg(args, 0), "modf", 1)
        frac, whole = _pymath.modf(a)
        return [whole, frac]

    def _m_random(it, args):
        # deterministic LCG (numerical recipes constants); Lua leaves the
        # RNG implementation-defined, so a seeded one is spec-conforming.
        it._rand_state = (it._rand_state * 1664525 + 1013904223) % (2**32)
        r = it._rand_state / 2**32
        if not args:
            return [r]
        m_ = int(_checknum(args[0], "random", 1))
        if len(args) == 1:
            return [float(1 + int(r * m_))]
        n_ = int(_checknum(args[1], "random", 2))
        return [float(m_ + int(r * (n_ - m_ + 1)))]

    def _m_randomseed(it, args):
        it._rand_state = int(_checknum(_arg(args, 0, 0.0), "randomseed", 1)) % (2**32)
        return []

    m.raw_set("max", _m_max)
    m.raw_set("min", _m_min)
    m.raw_set("fmod", _m_fmod)
    m.raw_set("pow", _m_pow)
    m.raw_set("modf", _m_modf)
    m.raw_set("random", _m_random)
    m.raw_set("randomseed", _m_randomseed)
    g.raw_set("math", m)

    # ---- os ---------------------------------------------------------------
    o = LuaTable()

    def _os_time(it, args):
        return [float(it.os_time())]

    def _os_clock(it, args):
        return [float(it.os_time())]

    def _os_getenv(it, args):
        return [None]  # no env leakage into scripts

    o.raw_set("time", _os_time)
    o.raw_set("clock", _os_clock)
    o.raw_set("getenv", _os_getenv)
    g.raw_set("os", o)


def _gsub_str_repl(repl: str, whole: str, caps: list) -> str:
    out = []
    i = 0
    while i < len(repl):
        c = repl[i]
        if c == "%" and i + 1 < len(repl):
            d = repl[i + 1]
            if d == "%":
                out.append("%")
            elif d == "0":
                out.append(whole)
            elif d.isdigit():
                idx = int(d) - 1
                if idx >= len(caps):
                    raise LuaError(f"invalid capture index %{d}")
                v = caps[idx]
                out.append(fmt_number(v) if isinstance(v, float) else str(v))
            else:
                raise LuaError("invalid use of '%' in replacement string")
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _lua_format(it: Interpreter, fmt: str, args: list) -> str:
    out = []
    i = 0
    argi = 0
    n = len(fmt)
    while i < n:
        c = fmt[i]
        if c != "%":
            out.append(c)
            i += 1
            continue
        i += 1
        if i < n and fmt[i] == "%":
            out.append("%")
            i += 1
            continue
        # flags / width / precision
        spec_start = i
        while i < n and fmt[i] in "-+ #0":
            i += 1
        while i < n and fmt[i].isdigit():
            i += 1
        if i < n and fmt[i] == ".":
            i += 1
            while i < n and fmt[i].isdigit():
                i += 1
        if i >= n:
            raise LuaError("invalid format string to 'format'")
        conv = fmt[i]
        spec = "%" + fmt[spec_start:i]
        i += 1
        a = args[argi] if argi < len(args) else None
        argi += 1
        if conv in "di":
            out.append((spec + "d") % int(_checknum(a, "format", argi)))
        elif conv == "u":
            out.append((spec + "d") % (int(_checknum(a, "format", argi)) & 0xFFFFFFFF))
        elif conv in "oxX":
            out.append((spec + conv) % (int(_checknum(a, "format", argi)) & 0xFFFFFFFFFFFFFFFF))
        elif conv == "c":
            out.append(chr(int(_checknum(a, "format", argi))))
        elif conv in "eEfgG":
            out.append((spec + conv) % _checknum(a, "format", argi))
        elif conv == "s":
            sv = a if isinstance(a, str) else lua_tostring(a)
            out.append((spec + "s") % sv)
        elif conv == "q":
            sv = a if isinstance(a, str) else lua_tostring(a)
            out.append(_quote_lua(sv))
        else:
            raise LuaError(f"invalid option '%{conv}' to 'format'")
    return "".join(out)


def _quote_lua(s: str) -> str:
    out = ['"']
    for ch in s:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\0":
            out.append("\\0")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)
