"""Stream-processor SQL front-end.

A recursive-descent parser for the reference's flex/bison grammar
(/root/reference/src/stream_processor/parser/sql.y:104-437, lexer
sql.l). The surface is deliberately tiny — 14 productions:

    CREATE STREAM name [WITH (k='v',...)] AS <select>
    CREATE SNAPSHOT name [WITH (...)] AS <select>
    FLUSH SNAPSHOT name AS <select>
    SELECT keys FROM STREAM:name | FROM TAG:'pattern'
        [WINDOW TUMBLING (n SECOND|MINUTE|HOUR)
         | WINDOW HOPPING (n UNIT, ADVANCE BY m UNIT)]
        [WHERE condition] [GROUP BY key[,key...]] [LIMIT n] ;

    keys: '*' | key | key AS alias | AVG|SUM|COUNT|MIN|MAX '(' key|'*' ')'
        | TIMESERIES_FORECAST '(' key ',' int ')'
        | NOW() | UNIX_TIMESTAMP() | RECORD_TAG() | RECORD_TIME()
        | key with subscripts: key['a']['b']
    condition: comparisons = != <> < <= > >=, AND OR NOT, parens,
        IS NULL / IS NOT NULL, @record.contains(key), RECORD.TIME(),
        literals int/float/'string'/true/false

IR mirrors struct flb_sp_cmd
(include/fluent-bit/stream_processor/flb_sp_parser.h:133-170).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

AGG_FUNCS = {"AVG", "SUM", "COUNT", "MIN", "MAX", "TIMESERIES_FORECAST"}
TIME_FUNCS = {"NOW", "UNIX_TIMESTAMP"}
RECORD_FUNCS = {"RECORD_TAG", "RECORD_TIME"}

_UNIT_SECONDS = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600}


@dataclass
class Key:
    name: str | None  # None => '*'
    subkeys: list[str] = field(default_factory=list)
    alias: str | None = None
    aggr: str | None = None  # AVG|SUM|COUNT|MIN|MAX|TIMESERIES_FORECAST
    time_func: str | None = None  # NOW|UNIX_TIMESTAMP
    record_func: str | None = None  # RECORD_TAG|RECORD_TIME
    forecast_seconds: int | None = None

    @property
    def out_name(self) -> str:
        """Result key naming (flb_sp_key_create,
        parser/flb_sp_parser.c:200-296): alias if given; aggregates
        auto-alias to 'FUNC(key)' / 'FUNC(*)'; subkey selections to
        "key['sub1']['sub2']"; plain keys keep their name."""
        if self.alias:
            return self.alias
        if self.time_func:
            return self.time_func
        if self.record_func:
            return self.record_func
        base = self.name if self.name is not None else "*"
        if self.subkeys:
            base = self.name + "".join(f"['{s}']" for s in self.subkeys)
        if self.aggr:
            return f"{self.aggr}({base})"
        return base


# Condition expression tree
@dataclass
class Comparison:
    op: str  # = != < <= > >=
    left: "Operand"
    right: "Operand"


@dataclass
class Logical:
    op: str  # AND | OR | NOT
    left: Any
    right: Any | None = None


@dataclass
class IsNull:
    operand: "Operand"
    negated: bool


@dataclass
class Contains:
    key: "Operand"


@dataclass
class Operand:
    kind: str  # key | int | float | str | bool | record_time
    value: Any = None
    subkeys: list[str] = field(default_factory=list)


@dataclass
class Window:
    kind: str  # tumbling | hopping
    size_sec: int
    advance_sec: int | None = None


@dataclass
class SpCommand:
    kind: str  # select | create_stream | create_snapshot | flush_snapshot
    keys: list[Key] = field(default_factory=list)
    source_type: str = "stream"  # stream | tag
    source: str = ""
    window: Window | None = None
    where: Any | None = None
    group_by: list[Key] = field(default_factory=list)
    limit: int | None = None
    stream_name: str | None = None
    props: dict[str, str] = field(default_factory=dict)


_TOKEN_RE = re.compile(
    r"""
    \s+
  | (?P<string>'(?:[^'\\]|\\.)*')
  | (?P<float>\d+\.\d+)
  | (?P<int>\d+)
  | (?P<contains>@record\.contains)
  | (?P<rectime>RECORD\.TIME)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.\-]*)
  | (?P<op><>|!=|<=|>=|=|<|>)
  | (?P<punct>[();,*\[\]:])
    """,
    re.VERBOSE | re.IGNORECASE,
)


def _tokenize(sql: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise ValueError(f"SP SQL: cannot tokenize at {sql[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind is None:
            continue
        out.append((kind, m.group(0)))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    # ----- token helpers
    def peek(self) -> tuple[str, str]:
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self) -> tuple[str, str]:
        t = self.peek()
        self.i += 1
        return t

    def accept_kw(self, *kws: str) -> str | None:
        k, v = self.peek()
        if k == "ident" and v.upper() in kws:
            self.i += 1
            return v.upper()
        return None

    def expect_kw(self, kw: str) -> None:
        if not self.accept_kw(kw):
            raise ValueError(f"SP SQL: expected {kw} at {self.peek()}")

    def accept_punct(self, p: str) -> bool:
        k, v = self.peek()
        if k == "punct" and v == p:
            self.i += 1
            return True
        return False

    def expect_punct(self, p: str) -> None:
        if not self.accept_punct(p):
            raise ValueError(f"SP SQL: expected {p!r} at {self.peek()}")

    # ----- grammar
    def parse(self) -> SpCommand:
        if self.accept_kw("CREATE"):
            what = self.accept_kw("STREAM", "SNAPSHOT")
            if not what:
                raise ValueError("SP SQL: CREATE STREAM|SNAPSHOT expected")
            name = self.next()[1]
            props: dict[str, str] = {}
            if self.accept_kw("WITH"):
                self.expect_punct("(")
                while not self.accept_punct(")"):
                    k = self.next()[1]
                    if self.peek() == ("op", "="):
                        self.next()
                    v = self.next()[1].strip("'")
                    props[k.lower()] = v
                    self.accept_punct(",")
            self.expect_kw("AS")
            cmd = self._select()
            cmd.kind = "create_stream" if what == "STREAM" else "create_snapshot"
            cmd.stream_name = name
            cmd.props = props
            return cmd
        if self.accept_kw("FLUSH"):
            self.expect_kw("SNAPSHOT")
            name = self.next()[1]
            self.expect_kw("AS")
            cmd = self._select()
            cmd.kind = "flush_snapshot"
            cmd.stream_name = name
            return cmd
        return self._select()

    def _select(self) -> SpCommand:
        self.expect_kw("SELECT")
        cmd = SpCommand(kind="select")
        cmd.keys = self._keys()
        self.expect_kw("FROM")
        src = self.next()
        if src[1].upper() == "STREAM":
            self.expect_punct(":")
            cmd.source_type = "stream"
            cmd.source = self.next()[1]
        elif src[1].upper() == "TAG":
            self.expect_punct(":")
            cmd.source_type = "tag"
            cmd.source = self.next()[1].strip("'")
        else:
            raise ValueError(f"SP SQL: FROM STREAM:|TAG: expected, got {src}")
        if self.accept_kw("WINDOW"):
            kind = self.accept_kw("TUMBLING", "HOPPING")
            self.expect_punct("(")
            n = int(self.next()[1])
            unit = self.next()[1].upper()
            size = n * _UNIT_SECONDS[unit]
            adv = None
            if kind == "HOPPING":
                self.expect_punct(",")
                self.expect_kw("ADVANCE")
                self.expect_kw("BY")
                m = int(self.next()[1])
                unit2 = self.next()[1].upper()
                adv = m * _UNIT_SECONDS[unit2]
            self.expect_punct(")")
            cmd.window = Window(kind.lower(), size, adv)
        if self.accept_kw("WHERE"):
            cmd.where = self._expr()
        if self.accept_kw("GROUP"):
            self.expect_kw("BY")
            cmd.group_by = [self._plain_key()]
            while self.accept_punct(","):
                cmd.group_by.append(self._plain_key())
        if self.accept_kw("LIMIT"):
            cmd.limit = int(self.next()[1])
        self.accept_punct(";")
        return cmd

    def _keys(self) -> list[Key]:
        keys = [self._key()]
        while self.accept_punct(","):
            keys.append(self._key())
        return keys

    def _key(self) -> Key:
        if self.accept_punct("*"):
            return Key(name=None)
        k, v = self.next()
        if k != "ident":
            raise ValueError(f"SP SQL: key expected, got {(k, v)}")
        upper = v.upper()
        if upper in AGG_FUNCS and self.accept_punct("("):
            if upper == "TIMESERIES_FORECAST":
                inner = self._plain_key()
                self.expect_punct(",")
                secs = int(self.next()[1])
                self.expect_punct(")")
                key = Key(name=inner.name, subkeys=inner.subkeys,
                          aggr=upper, forecast_seconds=secs)
            elif self.accept_punct("*"):
                self.expect_punct(")")
                key = Key(name=None, aggr=upper)
            else:
                inner = self._plain_key()
                self.expect_punct(")")
                key = Key(name=inner.name, subkeys=inner.subkeys, aggr=upper)
            key.alias = self._alias()
            return key
        if upper in TIME_FUNCS and self.accept_punct("("):
            self.expect_punct(")")
            return Key(name=None, time_func=upper, alias=self._alias())
        if upper in RECORD_FUNCS and self.accept_punct("("):
            self.expect_punct(")")
            return Key(name=None, record_func=upper, alias=self._alias())
        key = Key(name=v, subkeys=self._subkeys())
        key.alias = self._alias()
        return key

    def _plain_key(self) -> Key:
        k, v = self.next()
        if k != "ident":
            raise ValueError(f"SP SQL: key expected, got {(k, v)}")
        return Key(name=v, subkeys=self._subkeys())

    def _subkeys(self) -> list[str]:
        subs: list[str] = []
        while self.accept_punct("["):
            t = self.next()
            subs.append(t[1].strip("'"))
            self.expect_punct("]")
        return subs

    def _alias(self) -> str | None:
        if self.accept_kw("AS"):
            return self.next()[1]
        return None

    # expression grammar: or_expr > and_expr > not > primary
    def _expr(self):
        left = self._and_expr()
        while self.accept_kw("OR"):
            left = Logical("OR", left, self._and_expr())
        return left

    def _and_expr(self):
        left = self._not_expr()
        while self.accept_kw("AND"):
            left = Logical("AND", left, self._not_expr())
        return left

    def _not_expr(self):
        if self.accept_kw("NOT"):
            return Logical("NOT", self._not_expr())
        return self._primary()

    def _primary(self):
        if self.accept_punct("("):
            e = self._expr()
            self.expect_punct(")")
            return e
        k, v = self.peek()
        if k == "contains":
            self.next()
            self.expect_punct("(")
            key = self._plain_key()
            self.expect_punct(")")
            return Contains(Operand("key", key.name, key.subkeys))
        operand = self._operand()
        nk, nv = self.peek()
        if nk == "ident" and nv.upper() == "IS":
            self.next()
            negated = bool(self.accept_kw("NOT"))
            self.expect_kw("NULL")
            return IsNull(operand, negated)
        if nk == "op":
            op = self.next()[1]
            if op == "<>":
                op = "!="
            right = self._operand()
            return Comparison(op, operand, right)
        # bare key used as boolean => key presence (sql.y:363-366)
        if operand.kind == "key":
            return Contains(operand)
        raise ValueError(f"SP SQL: dangling operand {operand}")

    def _operand(self) -> Operand:
        k, v = self.next()
        if k == "string":
            return Operand("str", v[1:-1].replace("\\'", "'"))
        if k == "int":
            return Operand("int", int(v))
        if k == "float":
            return Operand("float", float(v))
        if k == "rectime":
            self.expect_punct("(")
            self.expect_punct(")")
            return Operand("record_time")
        if k == "ident":
            if v.upper() in ("TRUE", "FALSE"):
                return Operand("bool", v.upper() == "TRUE")
            if v.upper() == "NULL":
                # NULL is not a comparison operand in the grammar
                # (sql.y has no NULL literal; only IS [NOT] NULL) —
                # sp_invalid_queries.h expects this to error
                raise ValueError("SP SQL: NULL is not a valid operand")
            return Operand("key", v, self._subkeys())
        raise ValueError(f"SP SQL: operand expected, got {(k, v)}")


def parse_sql(sql: str) -> SpCommand:
    return _Parser(_tokenize(sql)).parse()
