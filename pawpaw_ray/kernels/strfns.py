"""Span-relative ``str`` equivalence kernels.

The reference re-implements most of the ``str`` API over substring views so
no substring is ever materialized (``/root/reference/pawpaw/ito.py:962-1313``).
Here the same operations are pure functions over ``(text, span)`` — the
ROWFN layer batch UDFs are built from (SURVEY.md §2.2).  All index
arguments and results are span-relative, exactly like the reference;
results that are substrings in ``str`` become spans here.

Differential-tested against the reference per function
(tests/test_strfns.py).
"""

from __future__ import annotations

import regex as rx

Span = tuple[int, int]


def _norm(span: Span, start: int | None, end: int | None) -> Span:
    """Python-slice index normalization against the span, then shift to
    absolute offsets (``Span.from_indices(...).offset(start)``,
    ``/root/reference/pawpaw/span.py:13-56``)."""
    length = span[1] - span[0]
    s, e, _ = slice(start, end).indices(length)
    return (span[0] + s, span[0] + e)


def str_count(text: str, span: Span, sub: str,
              start: int | None = None, end: int | None = None) -> int:
    return text.count(sub, *_norm(span, start, end))


def str_startswith(text: str, span: Span, prefix,
                   start: int | None = None, end: int | None = None) -> bool:
    # replicate CPython's odd start/end handling (ito.py:1000-1016)
    if start is not None and start != 0:
        ls = span[1] - span[0]
        if start > ls:
            return False
        start_c = start if start >= 0 else ls + start
        end_c = ls if end is None else end if end >= 0 else ls + end
        if start_c > end_c:
            return False
    return text.startswith(prefix, *_norm(span, start, end))


def str_endswith(text: str, span: Span, suffix,
                 start: int | None = None, end: int | None = None) -> bool:
    if start is not None and start != 0:
        ls = span[1] - span[0]
        if start > ls:
            return False
        start_c = start if start >= 0 else ls + start
        end_c = ls if end is None else end if end >= 0 else ls + end
        if start_c > end_c:
            return False
    return text.endswith(suffix, *_norm(span, start, end))


def str_eq(text: str, span: Span, val: str) -> bool:
    return (span[1] - span[0]) == len(val) and str_startswith(text, span, val)


def str_find(text: str, span: Span, sub: str,
             start: int | None = None, end: int | None = None) -> int:
    rv = text.find(sub, *_norm(span, start, end))
    return rv if rv == -1 else rv - span[0]


def str_index(text: str, span: Span, sub: str,
              start: int | None = None, end: int | None = None) -> int:
    return text.index(sub, *_norm(span, start, end)) - span[0]


def str_rfind(text: str, span: Span, sub: str,
              start: int | None = None, end: int | None = None) -> int:
    rv = text.rfind(sub, *_norm(span, start, end))
    return rv if rv == -1 else rv - span[0]


def str_rindex(text: str, span: Span, sub: str,
               start: int | None = None, end: int | None = None) -> int:
    return text.rindex(sub, *_norm(span, start, end)) - span[0]


# --- predicates (ito.py:1046-1104) -----------------------------------------

def _all_chars(text: str, span: Span, pred) -> bool:
    if span[0] == span[1]:
        return pred("")
    return all(pred(text[i]) for i in range(span[0], span[1]))


def str_isalnum(text, span): return _all_chars(text, span, str.isalnum)
def str_isalpha(text, span): return _all_chars(text, span, str.isalpha)
def str_isascii(text, span): return _all_chars(text, span, str.isascii)
def str_isdecimal(text, span): return _all_chars(text, span, str.isdecimal)
def str_isdigit(text, span): return _all_chars(text, span, str.isdigit)
def str_isnumeric(text, span): return _all_chars(text, span, str.isnumeric)
def str_isspace(text, span): return _all_chars(text, span, str.isspace)


def str_isprintable(text: str, span: Span) -> bool:
    if span[0] == span[1]:
        return "".isprintable()
    return any(text[i].isprintable() for i in range(span[0], span[1]))


def str_isidentifier(text: str, span: Span) -> bool:
    return text[span[0]:span[1]].isidentifier()


def str_istitle(text: str, span: Span) -> bool:
    return text[span[0]:span[1]].istitle()


def str_islower(text: str, span: Span) -> bool:
    alphas = False
    for i in range(span[0], span[1]):
        c = text[i]
        if c.isalpha():
            alphas = True
            if not c.islower():
                return False
    return alphas


def str_isupper(text: str, span: Span) -> bool:
    alphas = False
    for i in range(span[0], span[1]):
        c = text[i]
        if c.isalpha():
            alphas = True
            if not c.isupper():
                return False
    return alphas


# --- strips (ito.py:1112-1133) — offset arithmetic only ---------------------

def _c_in(text: str, chars: str | None):
    if chars is None or chars == "":
        return lambda i: text[i].isspace()
    return lambda i: text[i] in chars


def str_lstrip(text: str, span: Span, chars: str | None = None) -> Span:
    f = _c_in(text, chars)
    i = span[0]
    while i < span[1] and f(i):
        i += 1
    return (i, span[1])


def str_rstrip(text: str, span: Span, chars: str | None = None) -> Span:
    f = _c_in(text, chars)
    i = span[1] - 1
    while i >= 0 and f(i):
        i -= 1
    return (span[0], i + 1)


def str_strip(text: str, span: Span, chars: str | None = None) -> Span:
    return str_rstrip(text, str_lstrip(text, span, chars), chars)


# --- partition (ito.py:1141-1165) -------------------------------------------

def str_partition(text: str, span: Span, sep: str) -> tuple[Span, Span, Span]:
    if sep is None:
        raise ValueError("must be str, not NoneType")
    if sep == "":
        raise ValueError("empty separator")
    i = str_find(text, span, sep)
    if i < 0:
        return span, (span[1], span[1]), (span[1], span[1])
    j = i + span[0]
    k = j + len(sep)
    return (span[0], j), (j, k), (k, span[1])


def str_rpartition(text: str, span: Span, sep: str) -> tuple[Span, Span, Span]:
    if sep is None:
        raise ValueError("must be str, not NoneType")
    if sep == "":
        raise ValueError("empty separator")
    i = str_rfind(text, span, sep)
    if i < 0:
        return (span[1], span[1]), (span[1], span[1]), span
    j = i + span[0]
    k = j + len(sep)
    return (span[0], j), (j, k), (k, span[1])


# --- split (ito.py:1196-1285) -----------------------------------------------

def _nearest_non_ws(text: str, span: Span, start: int, reverse: bool = False) -> Span | None:
    """Nearest whitespace-free run from relative index ``start``
    (``Ito._nearest_non_ws_sub``, ito.py:1167-1194)."""
    start += span[0]
    if reverse:
        stop, step = span[0] - 1, -1
    else:
        stop, step = span[1], 1
    non_ws_i = start
    in_ws = True
    i = start
    for i in range(start, stop, step):
        c = text[i]
        if in_ws:
            if not c.isspace():
                non_ws_i = i
                in_ws = False
        else:
            if c.isspace():
                return (non_ws_i, i) if step == 1 else (i + 1, non_ws_i + 1)
    if not in_ws:
        i += step
        return (non_ws_i, i) if step == 1 else (i + 1, non_ws_i + 1)
    return None


def str_split(text: str, span: Span, sep: str | None = None,
              maxsplit: int = -1) -> list[Span]:
    if sep is None:
        rv: list[Span] = []
        if text == "":
            return rv
        i = 0
        while (sub := _nearest_non_ws(text, span, i)) is not None and maxsplit != 0:
            rv.append(sub)
            i = sub[1] - span[0]
            maxsplit -= 1
        if maxsplit == 0:
            tail_start = span[0] if not rv else rv[-1][1]
            tail = str_lstrip(text, (tail_start, span[1]))
            if tail[1] > tail[0]:
                rv.append(tail)
        return rv
    if sep == "":
        raise ValueError("empty separator")
    if maxsplit == 0:
        return [span]
    rv = []
    i = span[0]
    while (j := text.find(sep, i, span[1])) >= 0 and maxsplit != 0:
        rv.append((i, j))
        i = j + len(sep)
        maxsplit -= 1
    if not rv:
        return [span]
    rv.append(span if i == span[0] else (i, span[1]))
    return rv


def str_rsplit(text: str, span: Span, sep: str | None = None,
               maxsplit: int = -1) -> list[Span]:
    if sep is None:
        rv: list[Span] = []
        if text == "":
            return rv
        i = (span[1] - span[0]) - 1
        while (sub := _nearest_non_ws(text, span, i, True)) is not None and maxsplit != 0:
            rv.append(sub)
            i = sub[0] - 1 - span[0]
            maxsplit -= 1
        rv.reverse()
        if maxsplit == 0:
            head_stop = span[1] if not rv else rv[0][0]
            head = str_rstrip(text, (span[0], head_stop))
            if head[1] > head[0]:
                rv.insert(0, head)
        return rv
    if sep == "":
        raise ValueError("empty separator")
    if maxsplit == 0:
        return [span]
    rv = []
    i = span[1]
    while (j := text.rfind(sep, span[0], i)) >= 0 and maxsplit != 0:
        rv.insert(0, (j + len(sep), i))
        i = j
        maxsplit -= 1
    if not rv:
        return [span]
    rv.insert(0, span if i == span[1] else (span[0], i))
    return rv


# full Unicode EOL set (ito.py:1287-1288)
SPLITLINES_RE = rx.compile(
    r"\r\n|\r|\n|\v|\x0b|\f|\x0c|\x1c|\x1d|\x1e|\x85| | ", rx.DOTALL)


def str_splitlines(text: str, span: Span, keepends: bool = False) -> list[Span]:
    """(ito.py:1290-1297): TRAILING-retention split on the EOL regex with
    the final empty segment dropped."""
    rv: list[Span] = []
    pos = span[0]
    for m in SPLITLINES_RE.finditer(text, pos=span[0], endpos=span[1]):
        rv.append((pos, m.end() if keepends else m.start()))
        pos = m.end()
    rv.append((pos, span[1]))
    if rv and rv[-1][0] == rv[-1][1]:
        rv.pop()
    return rv


def str_removeprefix(text: str, span: Span, prefix: str) -> Span:
    if str_startswith(text, span, prefix):
        return (span[0] + len(prefix), span[1])
    return span


def str_removesuffix(text: str, span: Span, suffix: str) -> Span:
    if str_endswith(text, span, suffix):
        if not suffix:
            # reference quirk (ito.py:1311): ``stop=-len('')`` is stop=0,
            # so removing an empty suffix empties the span
            return (span[0], span[0])
        return (span[0], span[1] - len(suffix))
    return span
