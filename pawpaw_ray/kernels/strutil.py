"""Escape-aware string utilities used by the query-path parser.

Fresh implementations of the reference's parsing helpers
(``/root/reference/pawpaw/util.py`` — ``find_escapes`` :8-37,
``find_unescaped`` :40-79, ``split_unescaped`` :82-93, ``find_balanced``
:96-140), plain ``str`` in / ``str`` out.  These are ROWFN-tier helpers:
they run on short query strings at compile time, never in the per-batch
hot path.
"""

from __future__ import annotations

from typing import Iterable


def find_escapes(s: str, escape: str = "\\") -> Iterable[int]:
    """Indices of non-doubled escape chars (a doubled escape is a literal)."""
    esc = False
    for i, c in enumerate(s):
        if c == escape:
            esc = not esc
        elif esc:
            yield i - 1
            esc = False


def find_unescaped(s: str, chars: str, escape: str = "\\") -> Iterable[int]:
    """Indices of chars in ``chars`` not preceded by an (unconsumed) escape."""
    esc = False
    for i, c in enumerate(s):
        if esc:
            esc = False
        elif c == escape:
            esc = True
        elif c in chars:
            yield i
    if esc:
        raise ValueError(f"src ends with un-followed escape char {escape!r}")


def split_unescaped(s: str, char: str, escape: str = "\\") -> Iterable[str]:
    """Split on unescaped occurrences of ``char``."""
    cur = 0
    for i in find_unescaped(s, char, escape):
        yield s[cur:i]
        cur = i + 1
    yield s[cur:]


def find_balanced(s: str, lchar: str, rchar: str,
                  escape: str = "\\") -> Iterable[str]:
    """Yield outermost balanced ``lchar...rchar`` regions (escape-aware)."""
    lefts: list[int] = []
    for i in find_unescaped(s, lchar + rchar, escape):
        c = s[i]
        if c == lchar and (lchar != rchar or not lefts):
            lefts.append(i)
        else:
            if len(lefts) > 1:
                lefts.pop()
            elif len(lefts) == 1:
                yield s[lefts.pop():i + 1]
            else:
                raise ValueError(f"unbalanced right char {rchar} at index {i}")
    if lefts:
        raise ValueError(f"unbalanced left char {lchar} at index {lefts.pop()}")


def descape(value: str, escape: str = "\\") -> str:
    """Remove one level of escaping."""
    rv = []
    esc = False
    for c in value:
        if esc or c != escape:
            rv.append(c)
            esc = False
        else:
            esc = True
    if esc:
        raise ValueError("found escape with no succeeding character")
    return "".join(rv)
