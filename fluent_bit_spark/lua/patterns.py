"""Lua 5.1 pattern matching (manual §5.4.1), implemented from the spec.

A small backtracking matcher supporting character classes (%a %c %d %l
%p %s %u %w %x and complements), sets ``[...]`` with ranges and classes,
``.``, quantifiers ``* + - ?``, captures incl. position captures ``()``,
back-references ``%1``–``%9``, balanced ``%b``, frontier ``%f``, and the
``^``/``$`` anchors.  Used by the string library in
:mod:`fluent_bit_spark.lua.interp` to run real fluent-bit filter_lua
scripts (reference plugins/filter_lua/lua.c embeds Lua 5.1 + these
string functions).
"""

from __future__ import annotations


class LuaPatternError(ValueError):
    pass


_POS_CAP = -1  # position capture marker
_UNFINISHED = -2


def _class_match(ch: str, cl: str) -> bool:
    if cl.isalpha():
        low = cl.lower()
        if low == "a":
            res = ch.isalpha()
        elif low == "c":
            res = ord(ch) < 32 or ord(ch) == 127
        elif low == "d":
            res = ch.isdigit()
        elif low == "l":
            res = ch.islower()
        elif low == "p":
            res = 33 <= ord(ch) <= 126 and not ch.isalnum()
        elif low == "s":
            res = ch in " \t\n\r\f\v"
        elif low == "u":
            res = ch.isupper()
        elif low == "w":
            res = ch.isalnum()
        elif low == "x":
            res = ch in "0123456789abcdefABCDEF"
        else:
            return ch == cl
        return res if cl.islower() else not res
    return ch == cl


class _Matcher:
    def __init__(self, src: str, pat: str):
        self.src = src
        self.pat = pat
        self.caps: list[list[int]] = []  # [start, len]

    # -- pattern item helpers ------------------------------------------
    def _class_end(self, p: int) -> int:
        """Index just past the single pattern item starting at p.
        A ']' immediately after '[' (or '[^') is a literal, matching the
        5.1 do-while scan."""
        pat = self.pat
        c = pat[p]
        p += 1
        if c == "%":
            if p >= len(pat):
                raise LuaPatternError("malformed pattern (ends with '%')")
            return p + 1
        if c == "[":
            if p < len(pat) and pat[p] == "^":
                p += 1
            while True:
                if p >= len(pat):
                    raise LuaPatternError("malformed pattern (missing ']')")
                c2 = pat[p]
                p += 1
                if c2 == "%":
                    if p >= len(pat):
                        raise LuaPatternError("malformed pattern (ends with '%')")
                    p += 1
                if p < len(pat) and pat[p] == "]":
                    return p + 1
        return p

    def _single_match(self, s: int, p: int, ep: int) -> bool:
        if s >= len(self.src):
            return False
        ch = self.src[s]
        c = self.pat[p]
        if c == ".":
            return True
        if c == "%":
            return _class_match(ch, self.pat[p + 1])
        if c == "[":
            return self._match_set(ch, p, ep - 1)
        return ch == c

    def _match_set(self, ch: str, p: int, ec: int) -> bool:
        """Match ch against set pat[p..ec] where pat[p]=='[' pat[ec]==']'."""
        pat = self.pat
        neg = False
        p += 1
        if pat[p] == "^":
            neg = True
            p += 1
        found = False
        while p < ec:
            if pat[p] == "%":
                p += 1
                if _class_match(ch, pat[p]):
                    found = True
                p += 1
            elif p + 2 < ec and pat[p + 1] == "-":
                if pat[p] <= ch <= pat[p + 2]:
                    found = True
                p += 3
            else:
                if pat[p] == ch:
                    found = True
                p += 1
        return found != neg

    # -- main match loop --------------------------------------------------
    def match(self, s: int, p: int) -> int | None:
        pat, src = self.pat, self.src
        while True:
            if p >= len(pat):
                return s
            c = pat[p]
            if c == "(":
                if p + 1 < len(pat) and pat[p + 1] == ")":
                    # position capture
                    self.caps.append([s, _POS_CAP])
                    r = self.match(s, p + 2)
                    if r is None:
                        self.caps.pop()
                    return r
                self.caps.append([s, _UNFINISHED])
                r = self.match(s, p + 1)
                if r is None:
                    self.caps.pop()
                return r
            if c == ")":
                for cap in reversed(self.caps):
                    if cap[1] == _UNFINISHED:
                        cap[1] = s - cap[0]
                        r = self.match(s, p + 1)
                        if r is None:
                            cap[1] = _UNFINISHED
                        return r
                raise LuaPatternError("invalid pattern capture")
            if c == "$" and p + 1 == len(pat):
                return s if s == len(src) else None
            if c == "%":
                nxt = pat[p + 1] if p + 1 < len(pat) else ""
                if nxt == "b":
                    if p + 3 >= len(pat):
                        raise LuaPatternError("missing arguments to '%b'")
                    o, cl = pat[p + 2], pat[p + 3]
                    if s >= len(src) or src[s] != o:
                        return None
                    bal = 1
                    i = s + 1
                    while i < len(src):
                        if src[i] == cl:
                            bal -= 1
                            if bal == 0:
                                # tail call on rest
                                r = self.match(i + 1, p + 4)
                                return r
                        elif src[i] == o:
                            bal += 1
                        i += 1
                    return None
                if nxt == "f":
                    p += 2
                    if p >= len(pat) or pat[p] != "[":
                        raise LuaPatternError("missing '[' after '%f'")
                    ep = self._class_end(p)
                    prev = src[s - 1] if s > 0 else "\0"
                    cur = src[s] if s < len(src) else "\0"
                    if not self._match_set(prev, p, ep - 1) and self._match_set(
                        cur, p, ep - 1
                    ):
                        p = ep
                        continue
                    return None
                if nxt.isdigit():
                    idx = int(nxt) - 1
                    if idx >= len(self.caps) or self.caps[idx][1] < 0:
                        raise LuaPatternError(f"invalid capture index %{nxt}")
                    st, ln = self.caps[idx]
                    captured = src[st : st + ln]
                    if src.startswith(captured, s):
                        s += len(captured)
                        p += 2
                        continue
                    return None
            # ordinary item, possibly with quantifier
            ep = self._class_end(p)
            quant = pat[ep] if ep < len(pat) else ""
            if quant == "?":
                if self._single_match(s, p, ep):
                    r = self.match(s + 1, ep + 1)
                    if r is not None:
                        return r
                p = ep + 1
                continue
            if quant == "+":
                if not self._single_match(s, p, ep):
                    return None
                s += 1
                return self._max_expand(s, p, ep)
            if quant == "*":
                return self._max_expand(s, p, ep)
            if quant == "-":
                return self._min_expand(s, p, ep)
            if not self._single_match(s, p, ep):
                return None
            s += 1
            p = ep

    def _max_expand(self, s: int, p: int, ep: int) -> int | None:
        i = 0
        while self._single_match(s + i, p, ep):
            i += 1
        while i >= 0:
            r = self.match(s + i, ep + 1)
            if r is not None:
                return r
            i -= 1
        return None

    def _min_expand(self, s: int, p: int, ep: int) -> int | None:
        while True:
            r = self.match(s, ep + 1)
            if r is not None:
                return r
            if self._single_match(s, p, ep):
                s += 1
            else:
                return None

    def captures(self, s: int, e: int) -> list:
        """Capture values after a successful match over src[s:e].
        Position captures yield 1-based int positions; if no captures,
        the whole match is the single capture (per string.match)."""
        if not self.caps:
            return [self.src[s:e]]
        out = []
        for st, ln in self.caps:
            if ln == _POS_CAP:
                out.append(float(st + 1))
            else:
                out.append(self.src[st : st + ln])
        return out


def find(src: str, pat: str, init: int = 0) -> tuple[int, int, list] | None:
    """Find pat in src from 0-based init. Returns (start0, end0, caps)
    where end0 is exclusive; None if no match."""
    anchored = pat.startswith("^")
    p0 = 1 if anchored else 0
    s = init
    while True:
        m = _Matcher(src, pat)
        r = m.match(s, p0)
        if r is not None:
            return s, r, m.captures(s, r)
        if anchored or s >= len(src):
            return None
        s += 1
