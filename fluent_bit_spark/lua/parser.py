"""Lua 5.1 recursive-descent parser (public spec, lua.org/manual/5.1).

Produces a plain-tuple AST (picklable, so a script compiled once on the
driver ships to executors inside a mapInPandas closure).  Covers the
full statement/expression grammar used by fluent-bit filter_lua scripts
(reference plugins/filter_lua/lua.c + tests/runtime/filter_lua.c):
assignments, local/global functions, closures, numeric/generic for,
while/repeat, table constructors, method calls, varargs, and the full
binary/unary operator set with Lua precedence.

AST shape
---------
Expressions::

    ('nil',) ('true',) ('false',) ('num', float) ('str', str) ('vararg',)
    ('name', n) ('index', obj, key) ('call', fn, [args])
    ('method', obj, name, [args]) ('func', [params], is_vararg, block)
    ('table', [('arr', e) | ('kv', k, v), ...])
    ('binop', op, l, r) ('and', l, r) ('or', l, r) ('unop', op, e)

Statements::

    ('local', [names], [exprs]) ('assign', [targets], [exprs])
    ('callstat', callexpr) ('if', [(cond, block), ...], else_block|None)
    ('while', cond, block) ('repeat', block, cond)
    ('fornum', var, start, stop, step|None, block)
    ('forin', [names], [exprs], block)
    ('return', [exprs]) ('break',) ('do', block)
"""

from __future__ import annotations

from .lexer import LuaSyntaxError, Token, tokenize

# Binary operator precedence (left, right) — Lua 5.1 lparser.c table,
# re-derived from the reference manual §2.5.6.
_BINPRI = {
    "or": (1, 1),
    "and": (2, 2),
    "<": (3, 3), ">": (3, 3), "<=": (3, 3), ">=": (3, 3),
    "~=": (3, 3), "==": (3, 3),
    "..": (9, 8),   # right associative
    "+": (10, 10), "-": (10, 10),
    "*": (11, 11), "/": (11, 11), "%": (11, 11),
    "^": (14, 13),  # right associative, above unary
}
_UNARY_PRI = 12


class _Parser:
    def __init__(self, toks: list[Token]):
        self.toks = toks
        self.pos = 0

    # -- token helpers -------------------------------------------------
    @property
    def cur(self) -> Token:
        return self.toks[self.pos]

    def next(self) -> Token:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def check(self, kind: str, value: str | None = None) -> bool:
        t = self.cur
        return t.kind == kind and (value is None or t.value == value)

    def accept(self, kind: str, value: str | None = None) -> bool:
        if self.check(kind, value):
            self.pos += 1
            return True
        return False

    def expect(self, kind: str, value: str | None = None) -> Token:
        if not self.check(kind, value):
            t = self.cur
            raise LuaSyntaxError(
                f"expected {value or kind}, got {t.value!r} at line {t.line}"
            )
        return self.next()

    # -- blocks ---------------------------------------------------------
    _BLOCK_ENDERS = {"end", "else", "elseif", "until"}

    def block(self) -> list:
        stmts: list = []
        while True:
            t = self.cur
            if t.kind == "eof":
                break
            if t.kind == "kw" and t.value in self._BLOCK_ENDERS:
                break
            if t.kind == "op" and t.value == ";":
                self.next()
                continue
            if t.kind == "kw" and t.value == "return":
                self.next()
                exprs: list = []
                if not (
                    self.cur.kind == "eof"
                    or (self.cur.kind == "kw" and self.cur.value in self._BLOCK_ENDERS)
                    or self.check("op", ";")
                ):
                    exprs = self.exprlist()
                self.accept("op", ";")
                stmts.append(("return", exprs))
                break  # return ends the block
            if t.kind == "kw" and t.value == "break":
                self.next()
                self.accept("op", ";")
                stmts.append(("break",))
                break
            stmts.append(self.statement())
        return stmts

    def statement(self):
        t = self.cur
        if t.kind == "kw":
            if t.value == "local":
                return self.local_stat()
            if t.value == "if":
                return self.if_stat()
            if t.value == "while":
                return self.while_stat()
            if t.value == "repeat":
                return self.repeat_stat()
            if t.value == "for":
                return self.for_stat()
            if t.value == "function":
                return self.function_stat()
            if t.value == "do":
                self.next()
                body = self.block()
                self.expect("kw", "end")
                return ("do", body)
        return self.expr_stat()

    def local_stat(self):
        self.expect("kw", "local")
        if self.accept("kw", "function"):
            name = self.expect("name").value
            fn = self.funcbody()
            # local function f ... : name scoped before body (recursion)
            return ("localfunc", name, fn)
        names = [self.expect("name").value]
        while self.accept("op", ","):
            names.append(self.expect("name").value)
        exprs: list = []
        if self.accept("op", "="):
            exprs = self.exprlist()
        return ("local", names, exprs)

    def if_stat(self):
        self.expect("kw", "if")
        arms = []
        cond = self.expr()
        self.expect("kw", "then")
        arms.append((cond, self.block()))
        else_block = None
        while True:
            if self.accept("kw", "elseif"):
                c = self.expr()
                self.expect("kw", "then")
                arms.append((c, self.block()))
                continue
            if self.accept("kw", "else"):
                else_block = self.block()
            self.expect("kw", "end")
            break
        return ("if", arms, else_block)

    def while_stat(self):
        self.expect("kw", "while")
        cond = self.expr()
        self.expect("kw", "do")
        body = self.block()
        self.expect("kw", "end")
        return ("while", cond, body)

    def repeat_stat(self):
        self.expect("kw", "repeat")
        body = self.block()
        self.expect("kw", "until")
        cond = self.expr()
        return ("repeat", body, cond)

    def for_stat(self):
        self.expect("kw", "for")
        first = self.expect("name").value
        if self.accept("op", "="):
            start = self.expr()
            self.expect("op", ",")
            stop = self.expr()
            step = None
            if self.accept("op", ","):
                step = self.expr()
            self.expect("kw", "do")
            body = self.block()
            self.expect("kw", "end")
            return ("fornum", first, start, stop, step, body)
        names = [first]
        while self.accept("op", ","):
            names.append(self.expect("name").value)
        self.expect("kw", "in")
        exprs = self.exprlist()
        self.expect("kw", "do")
        body = self.block()
        self.expect("kw", "end")
        return ("forin", names, exprs, body)

    def function_stat(self):
        # function Name{.Name}[:Name] body  =>  assignment
        self.expect("kw", "function")
        target = ("name", self.expect("name").value)
        is_method = False
        while True:
            if self.accept("op", "."):
                target = ("index", target, ("str", self.expect("name").value))
                continue
            if self.accept("op", ":"):
                target = ("index", target, ("str", self.expect("name").value))
                is_method = True
            break
        fn = self.funcbody(is_method=is_method)
        return ("assign", [target], [fn])

    def funcbody(self, is_method: bool = False):
        self.expect("op", "(")
        params: list[str] = ["self"] if is_method else []
        is_vararg = False
        if not self.check("op", ")"):
            while True:
                if self.accept("op", "..."):
                    is_vararg = True
                    break
                params.append(self.expect("name").value)
                if not self.accept("op", ","):
                    break
        self.expect("op", ")")
        body = self.block()
        self.expect("kw", "end")
        return ("func", params, is_vararg, body)

    def expr_stat(self):
        e = self.suffixedexp()
        if self.check("op", "=") or self.check("op", ","):
            targets = [e]
            while self.accept("op", ","):
                targets.append(self.suffixedexp())
            self.expect("op", "=")
            exprs = self.exprlist()
            for tgt in targets:
                if tgt[0] not in ("name", "index"):
                    raise LuaSyntaxError("cannot assign to this expression")
            return ("assign", targets, exprs)
        if e[0] not in ("call", "method"):
            raise LuaSyntaxError(
                f"syntax error near line {self.cur.line}: expression is not a statement"
            )
        return ("callstat", e)

    # -- expressions ------------------------------------------------------
    def exprlist(self) -> list:
        out = [self.expr()]
        while self.accept("op", ","):
            out.append(self.expr())
        return out

    def expr(self, limit: int = 0):
        t = self.cur
        if (t.kind == "kw" and t.value == "not") or (
            t.kind == "op" and t.value in ("-", "#")
        ):
            op = t.value
            self.next()
            operand = self.expr(_UNARY_PRI)
            left = ("unop", op, operand)
        else:
            left = self.simpleexp()
        while True:
            t = self.cur
            op = None
            if t.kind == "op" and t.value in _BINPRI:
                op = t.value
            elif t.kind == "kw" and t.value in ("and", "or"):
                op = t.value
            if op is None:
                break
            lpri, rpri = _BINPRI[op]
            if lpri <= limit:
                break
            self.next()
            right = self.expr(rpri)
            if op == "and":
                left = ("and", left, right)
            elif op == "or":
                left = ("or", left, right)
            else:
                left = ("binop", op, left, right)
        return left

    def simpleexp(self):
        t = self.cur
        if t.kind == "number":
            self.next()
            return ("num", t.value)
        if t.kind == "string":
            self.next()
            return ("str", t.value)
        if t.kind == "kw":
            if t.value == "nil":
                self.next()
                return ("nil",)
            if t.value == "true":
                self.next()
                return ("true",)
            if t.value == "false":
                self.next()
                return ("false",)
            if t.value == "function":
                self.next()
                return self.funcbody()
        if t.kind == "op":
            if t.value == "...":
                self.next()
                return ("vararg",)
            if t.value == "{":
                return self.tablector()
        return self.suffixedexp()

    def primaryexp(self):
        t = self.cur
        if t.kind == "name":
            self.next()
            return ("name", t.value)
        if self.accept("op", "("):
            e = self.expr()
            self.expect("op", ")")
            # parenthesized expr truncates to one value
            return ("paren", e)
        raise LuaSyntaxError(f"unexpected symbol {t.value!r} at line {t.line}")

    def suffixedexp(self):
        e = self.primaryexp()
        while True:
            t = self.cur
            if t.kind == "op" and t.value == ".":
                self.next()
                e = ("index", e, ("str", self.expect("name").value))
            elif t.kind == "op" and t.value == "[":
                self.next()
                k = self.expr()
                self.expect("op", "]")
                e = ("index", e, k)
            elif t.kind == "op" and t.value == ":":
                self.next()
                name = self.expect("name").value
                args = self.callargs()
                e = ("method", e, name, args)
            elif (t.kind == "op" and t.value in ("(", "{")) or t.kind == "string":
                args = self.callargs()
                e = ("call", e, args)
            else:
                break
        return e

    def callargs(self) -> list:
        t = self.cur
        if t.kind == "string":  # f "str" sugar
            self.next()
            return [("str", t.value)]
        if t.kind == "op" and t.value == "{":  # f{...} sugar
            return [self.tablector()]
        self.expect("op", "(")
        args: list = []
        if not self.check("op", ")"):
            args = self.exprlist()
        self.expect("op", ")")
        return args

    def tablector(self):
        self.expect("op", "{")
        fields: list = []
        while not self.check("op", "}"):
            t = self.cur
            if t.kind == "op" and t.value == "[":
                self.next()
                k = self.expr()
                self.expect("op", "]")
                self.expect("op", "=")
                fields.append(("kv", k, self.expr()))
            elif t.kind == "name" and self.toks[self.pos + 1] == Token(
                "op", "=", self.toks[self.pos + 1].line
            ):
                self.next()
                self.next()
                fields.append(("kv", ("str", t.value), self.expr()))
            else:
                fields.append(("arr", self.expr()))
            if not (self.accept("op", ",") or self.accept("op", ";")):
                break
        self.expect("op", "}")
        return ("table", fields)


def parse(src: str) -> list:
    """Parse Lua source into a block (list of statement tuples)."""
    p = _Parser(tokenize(src))
    body = p.block()
    if p.cur.kind != "eof":
        t = p.cur
        raise LuaSyntaxError(f"unexpected {t.value!r} at line {t.line}")
    return body
