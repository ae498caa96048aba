"""Lua 5.1 lexer (public language spec; www.lua.org/manual/5.1).

Tokenizes the Lua-script subset accepted by
:mod:`fluent_bit_spark.lua.parser` — enough to run every script shape
exercised by the reference's filter_lua runtime tests
(tests/runtime/filter_lua.c) plus the string/table/math-heavy scripts
real fluent-bit users write.
"""

from __future__ import annotations

from typing import NamedTuple


class LuaSyntaxError(SyntaxError):
    pass


class Token(NamedTuple):
    kind: str  # 'name' | 'number' | 'string' | 'kw' | 'op' | 'eof'
    value: str | float
    line: int


KEYWORDS = frozenset(
    "and break do else elseif end false for function if in local nil not "
    "or repeat return then true until while".split()
)

# longest-first so '...' wins over '..' wins over '.'
_OPS = (
    "...", "..", "==", "~=", "<=", ">=",
    "+", "-", "*", "/", "%", "^", "#", "<", ">", "=",
    "(", ")", "{", "}", "[", "]", ";", ":", ",", ".",
)

_ESCAPES = {
    "a": "\a", "b": "\b", "f": "\f", "n": "\n", "r": "\r",
    "t": "\t", "v": "\v", "\\": "\\", '"': '"', "'": "'", "\n": "\n",
}


def _long_bracket_level(src: str, i: int) -> int | None:
    """At src[i] == '[': return level N if this opens [=*[ , else None."""
    j = i + 1
    while j < len(src) and src[j] == "=":
        j += 1
    if j < len(src) and src[j] == "[":
        return j - i - 1
    return None


def tokenize(src: str) -> list[Token]:
    toks: list[Token] = []
    i, n, line = 0, len(src), 1
    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        # comments
        if src.startswith("--", i):
            i += 2
            if i < n and src[i] == "[":
                lvl = _long_bracket_level(src, i)
                if lvl is not None:
                    close = "]" + "=" * lvl + "]"
                    end = src.find(close, i)
                    if end < 0:
                        raise LuaSyntaxError(f"unfinished long comment at line {line}")
                    line += src.count("\n", i, end)
                    i = end + len(close)
                    continue
            nl = src.find("\n", i)
            i = n if nl < 0 else nl
            continue
        # long string
        if c == "[":
            lvl = _long_bracket_level(src, i)
            if lvl is not None:
                start = i + lvl + 2
                if start < n and src[start] == "\n":  # skip first newline
                    start += 1
                close = "]" + "=" * lvl + "]"
                end = src.find(close, start)
                if end < 0:
                    raise LuaSyntaxError(f"unfinished long string at line {line}")
                body = src[start:end]
                toks.append(Token("string", body, line))
                line += src.count("\n", i, end)
                i = end + len(close)
                continue
        # quoted string
        if c in "'\"":
            quote = c
            i += 1
            buf: list[str] = []
            while True:
                if i >= n:
                    raise LuaSyntaxError(f"unfinished string at line {line}")
                ch = src[i]
                if ch == quote:
                    i += 1
                    break
                if ch == "\n":
                    raise LuaSyntaxError(f"unfinished string at line {line}")
                if ch == "\\":
                    i += 1
                    if i >= n:
                        raise LuaSyntaxError(f"unfinished string at line {line}")
                    e = src[i]
                    if e in _ESCAPES:
                        buf.append(_ESCAPES[e])
                        if e == "\n":
                            line += 1
                        i += 1
                    elif e.isdigit():  # \ddd decimal byte
                        d = e
                        i += 1
                        for _ in range(2):
                            if i < n and src[i].isdigit():
                                d += src[i]
                                i += 1
                        code = int(d)
                        if code > 255:
                            raise LuaSyntaxError(f"escape too large at line {line}")
                        buf.append(chr(code))
                    elif e == "x":  # \xNN (5.2 ext, common in scripts)
                        h = src[i + 1 : i + 3]
                        buf.append(chr(int(h, 16)))
                        i += 3
                    else:
                        raise LuaSyntaxError(
                            f"invalid escape '\\{e}' at line {line}"
                        )
                else:
                    buf.append(ch)
                    i += 1
            toks.append(Token("string", "".join(buf), line))
            continue
        # number
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            if src.startswith(("0x", "0X"), i):
                j = i + 2
                while j < n and src[j] in "0123456789abcdefABCDEF":
                    j += 1
                val = float(int(src[i:j], 16))
            else:
                while j < n and (src[j].isdigit() or src[j] == "."):
                    j += 1
                if j < n and src[j] in "eE":
                    j += 1
                    if j < n and src[j] in "+-":
                        j += 1
                    while j < n and src[j].isdigit():
                        j += 1
                try:
                    val = float(src[i:j])
                except ValueError:
                    raise LuaSyntaxError(
                        f"malformed number '{src[i:j]}' at line {line}"
                    ) from None
            toks.append(Token("number", val, line))
            i = j
            continue
        # name / keyword
        if c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            word = src[i:j]
            toks.append(Token("kw" if word in KEYWORDS else "name", word, line))
            i = j
            continue
        # operator
        for op in _OPS:
            if src.startswith(op, i):
                toks.append(Token("op", op, line))
                i += len(op)
                break
        else:
            raise LuaSyntaxError(f"unexpected character {c!r} at line {line}")
    toks.append(Token("eof", "", line))
    return toks
