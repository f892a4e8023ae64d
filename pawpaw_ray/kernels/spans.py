"""Span algebra kernels — the row-level building blocks of every batch UDF.

These are pure functions over ``(text, span)`` pairs: no Ray, no Arrow.  They
re-express the reference's core tree-construction semantics
(``/root/reference/pawpaw/ito.py`` — ``Ito.from_match`` :114-129,
``Ito.from_re`` :131-180, ``Ito.from_gaps`` :196-269 — and
``/root/reference/pawpaw/arborform/itorator/split.py:105-156``) over flat
span arrays instead of object trees, so the batch stages can emit Arrow
``list<struct{start,stop,desc,parent}>`` columns without building Python
node objects per character.

A *node* is the tuple ``(start, stop, desc, parent)`` where ``parent`` is the
index of the parent node within the same flat list (``-1`` for roots) and
nodes appear in preorder (parents before children, siblings in span order —
the same order the reference's sorted ``ChildItos`` invariant produces,
``ito.py:1532-1544``).
"""

from __future__ import annotations

import enum
from typing import Callable, Iterable, Sequence

from pawpaw_ray.kernels import guard

Span = tuple[int, int]
Node = tuple[int, int, str | None, int]  # (start, stop, desc, parent_idx)


class Retention(enum.IntEnum):
    """Boundary retention modes of the split kernel.

    Mirrors ``Split.BoundaryRetention`` semantics
    (``/root/reference/pawpaw/arborform/itorator/split.py:13-18,29-40``):
    given P-O-O-S (prefix, boundaries ``-``, middle segments O, suffix S):

      NONE     -> P O O S   (boundaries discarded)
      LEADING  -> -O -O -S  (boundary kept as prefix of following segment;
                             leading P discarded)
      TRAILING -> P- O- O-  (boundary kept as suffix of preceding segment;
                             trailing S discarded)
      ALL      -> P - O - O - S (boundaries yielded as distinct items)
    """

    NONE = 0
    LEADING = 1
    TRAILING = 2
    ALL = 3


# ---------------------------------------------------------------------------
# regex group-key helpers
# ---------------------------------------------------------------------------

def preferred_group_keys(pattern) -> list[int | str]:
    """Per-group preferred key: the group's name if it has one, else its index.

    Index 0 (the whole match) is included; callers exclude it when they only
    want capture groups.  Matches ``GroupKeys.preferred``
    (``/root/reference/pawpaw/ito.py:22-29``).
    """
    keys: list[int | str] = list(range(pattern.groups + 1))
    for name, idx in pattern.groupindex.items():
        keys[idx] = name
    return keys


def _desc_of_key(key: int | str) -> str:
    return str(key)


# ---------------------------------------------------------------------------
# match → nested nodes (the hierarchical group-tree kernel)
# ---------------------------------------------------------------------------

def nest_match(
    match,
    group_keys: Sequence[int | str] | None = None,
    desc_func: Callable[[object, int | str], str | None] = lambda m, gk: _desc_of_key(gk),
    base: int = 0,
) -> list[Node]:
    """Build a hierarchical node list from one ``regex.Match``.

    All capture spans of all ``group_keys`` are sorted by ``(start, -stop)``
    (containers before containees at equal start) and nested with a path
    stack: a span that escapes the top of the stack pops it; the resulting
    parent is whatever remains on top.  This reproduces the reference's
    ``Ito.from_match`` (``/root/reference/pawpaw/ito.py:114-129``) including
    multi-capture groups (``match.spans(gk)`` yields every capture).

    ``base`` is added to node indices' ``parent`` values by the caller if the
    nodes are appended to a larger flat list; roots get parent ``-1``.
    Returns nodes in preorder.
    """
    if group_keys is None:
        group_keys = preferred_group_keys(match.re)

    pairs: list[tuple[Span, int | str]] = [
        (span, gk)
        for gk in group_keys
        for span in match.spans(gk)
        if span != (-1, -1)
    ]
    pairs.sort(key=lambda p: (p[0][0], -p[0][1]))

    nodes: list[Node] = []
    stack: list[int] = []  # indices into nodes
    for (s, e), gk in pairs:
        while stack and (s < nodes[stack[-1]][0] or e > nodes[stack[-1]][1]):
            stack.pop()
        parent = stack[-1] + base if stack else -1
        nodes.append((s, e, desc_func(match, gk), parent))
        stack.append(len(nodes) - 1)
    return nodes


def extract(
    text: str,
    span: Span,
    pattern,
    group_keys: Sequence[int | str] | None = None,
    desc_func: Callable[[object, int | str], str | None] | None = None,
    limit: int | None = None,
    base: int = 0,
    trusted: bool = False,
) -> list[Node]:
    """Run ``pattern.finditer`` windowed to ``span`` and nest each match.

    The window uses ``pos``/``endpos`` — never slicing — the reference's
    zero-copy trick (``/root/reference/pawpaw/ito.py:888-956``).  ``limit``
    caps the number of *root* nodes, mirroring ``Ito.from_re`` limit
    semantics (``ito.py:168-180``).  Default ``group_keys`` = all named /
    indexed capture groups except group 0, matching ``Extract``'s default
    group filter (``/root/reference/pawpaw/arborform/itorator/extract.py:16``).
    """
    if group_keys is None:
        group_keys = [k for k in preferred_group_keys(pattern) if str(k) != "0"]
    if desc_func is None:
        desc_func = lambda m, gk: _desc_of_key(gk)  # noqa: E731

    nodes: list[Node] = []
    n_roots = 0
    for m in guard.finditer(pattern, text, span[0], span[1], trusted=trusted):
        sub = nest_match(m, group_keys, desc_func, base=base + len(nodes))
        if not sub:
            continue
        for nd in sub:
            nodes.append(nd)
            if nd[3] == -1:
                n_roots += 1
        if limit is not None and n_roots >= limit:
            break
    if limit is not None and n_roots > limit:
        # truncate whole root subtrees beyond the limit
        kept: list[Node] = []
        roots = 0
        for nd in nodes:
            if nd[3] == -1:
                roots += 1
                if roots > limit:
                    break
            kept.append(nd)
        nodes = kept
    return nodes


# ---------------------------------------------------------------------------
# split kernels
# ---------------------------------------------------------------------------

def split_by_boundaries(
    span: Span,
    boundaries: Sequence[Span],
    retention: Retention = Retention.NONE,
    return_zero_split: bool = True,
    limit: int | None = None,
) -> list[tuple[Span, bool]]:
    """Split ``span`` around ordered boundary spans.

    Returns ``[(span, is_boundary), ...]`` in stream order.  Zero-length
    results are dropped; with no boundaries and ``return_zero_split`` the
    whole input span is returned (non-boundary).  Reproduces
    ``Split._transform`` (``/root/reference/pawpaw/arborform/itorator/
    split.py:105-156``) for all four retention modes, including the
    interleaved emission order of ``Retention.ALL``.
    """
    start0, stop0 = span
    if limit == 0 and return_zero_split:
        return [(span, False)]

    out: list[tuple[Span, bool]] = []
    prior: Span | None = None
    count = 0
    for cur in boundaries:
        if limit is not None and count >= limit:
            break
        if prior is None:
            if retention == Retention.LEADING:
                s = e = 0
            else:
                s = start0
                e = cur[0] if retention in (Retention.NONE, Retention.ALL) else cur[1]
        else:
            if retention in (Retention.NONE, Retention.ALL):
                s, e = prior[1], cur[0]
            elif retention == Retention.LEADING:
                s, e = prior[0], cur[0]
            else:  # TRAILING
                s, e = prior[1], cur[1]
        count += 1
        if s != e:
            out.append(((s, e), False))
        if retention == Retention.ALL and cur[0] < cur[1]:
            out.append((cur, True))
        prior = cur

    if prior is not None and retention != Retention.TRAILING:
        s = prior[1] if retention in (Retention.NONE, Retention.ALL) else prior[0]
        if s != stop0:
            out.append(((s, stop0), False))

    if prior is None and not out and return_zero_split:
        out.append((span, False))
    return out


def split_spans(
    text: str,
    span: Span,
    pattern,
    retention: Retention = Retention.NONE,
    return_zero_split: bool = True,
    limit: int | None = None,
    trusted: bool = False,
) -> list[Span]:
    """Split by a regex: boundaries are the group-0 spans of each match.

    Equivalent to the reference's ``Split(regex.Pattern)`` construction,
    which wraps the pattern in an Extract keeping only group 0
    (``split.py:70-76``).  Returns only the segment/boundary spans in order
    (callers that need the boundary flag use :func:`split_by_boundaries`).
    """
    bounds = [m.span() for m in guard.finditer(pattern, text, span[0], span[1], trusted=trusted)]
    return [s for s, _ in split_by_boundaries(span, bounds, retention, return_zero_split, limit)]


def gaps(
    span: Span,
    non_gaps: Iterable[Span],
    return_zero_widths: bool = False,
) -> list[Span]:
    """Negative-space spans between ordered ``non_gaps`` within ``span``.

    Overlapping non-gaps are tolerated; unordered input raises.  Mirrors
    ``Ito.from_gaps`` (``/root/reference/pawpaw/ito.py:196-269``).
    """
    start, end = span
    out: list[Span] = []
    it = iter(non_gaps)
    last = next(it, None)
    if last is None:
        if start < end:
            out.append((start, end))
        return out
    if start < last[0]:
        out.append((start, min(last[0], end)))
    while last[1] < end:
        cur = next(it, None)
        if cur is None:
            break
        if cur[0] < last[0]:
            raise ValueError("non_gaps is unordered")
        if cur[0] < last[1]:  # overlap
            pass
        elif cur[0] == last[1]:  # adjacent
            if return_zero_widths:
                out.append((last[1], cur[0]))
        elif cur[0] >= end:
            break
        else:
            out.append((last[1], cur[0]))
        last = cur
    if last[1] < end:
        out.append((last[1], end))
    return out


def from_substrings(text: str, span: Span, *substrings: str) -> list[Span]:
    """Locate ordered, non-overlapping literal substrings left→right
    (``Ito.from_substrings``, ``/root/reference/pawpaw/ito.py:271-314``);
    raises ``ValueError`` when a substring is absent in the remaining
    window (``str.index`` semantics)."""
    i, j = span
    out: list[Span] = []
    for sub in substrings:
        i = text.index(sub, i, j)
        k = i + len(sub)
        out.append((i, k))
        i = k
    return out


def nest_spans(spans: Sequence[tuple[Span, str | None]], base: int = 0) -> list[Node]:
    """Nest arbitrary (span, desc) pairs by containment: sort by
    ``(start, -stop)``, stack-nest — the flat-array form of
    ``ChildItos.add_hierarchical`` for nested-or-disjoint inputs
    (``/root/reference/pawpaw/ito.py:1546-1615``)."""
    pairs = sorted(spans, key=lambda p: (p[0][0], -p[0][1]))
    nodes: list[Node] = []
    stack: list[int] = []
    for (s, e), desc in pairs:
        while stack and (s < nodes[stack[-1]][0] or e > nodes[stack[-1]][1]):
            stack.pop()
        parent = stack[-1] + base if stack else -1
        nodes.append((s, e, desc, parent))
        stack.append(len(nodes) - 1)
    return nodes


def adopt_spans(spans: Sequence[tuple[Span, str | None]],
                desc: str | None = None) -> list[Node]:
    """Synthesize a parent covering min-start..max-stop with the inputs
    nested hierarchically beneath it (``Ito.adopt``, ``ito.py:721-764``;
    value-equal duplicates collapse, as the reference's set does).
    Returns the flat preorder node list, root first."""
    if not spans:
        raise ValueError("spans is empty")
    uniq = list(dict.fromkeys(spans))
    start = min(s[0][0] for s in uniq)
    stop = max(s[0][1] for s in uniq)
    return [(start, stop, desc, -1)] + [
        (s, e, d, p + 1 if p >= 0 else 0)
        for s, e, d, p in nest_spans(uniq)]


def strip_to_children(span: Span, child_spans: Sequence[Span]) -> Span:
    """Shrink to the extent of the children (``Ito.strip_to_children``,
    ``ito.py:803-815``); unchanged when childless."""
    if not child_spans:
        return span
    return (child_spans[0][0], child_spans[-1][1])


def invert_children(span: Span, child_spans: Sequence[Span]) -> list[Span]:
    """Gap spans between the (ordered) children — the children of
    ``Ito.invert_children``'s clone (``ito.py:817-841``)."""
    return gaps(span, child_spans)


def to_line_col(text: str, pos: int, eol) -> tuple[int, int]:
    """1-based (line, col) of an absolute position (``Ito.to_line_col``,
    ``ito.py:1376-1403``) — lineage/diagnostics columns.  ``eol`` is a
    literal string or a compiled pattern."""
    if hasattr(eol, "finditer"):  # compiled pattern
        line = 1
        m = None
        for m in guard.finditer(eol, text, 0, pos):
            line += 1
        col = 1 + (pos if m is None else pos - m.span()[1])
        return line, col
    prior = text.rfind(eol, 0, pos)
    if prior == -1:
        return 1, pos + 1
    return text.count(eol, 0, prior) + 2, pos - (prior + len(eol)) + 1


def strip_span(text: str, span: Span, chars: str | None = None) -> Span:
    """Whitespace/charset strip as pure offset arithmetic (no string copy).

    Mirrors ``Ito.str_strip`` family (``/root/reference/pawpaw/ito.py:
    1110-1133``): shrink both ends while the end char is in ``chars``
    (or ``str.isspace`` when ``chars`` is None).
    """
    s, e = span
    if chars is None:
        while s < e and text[s].isspace():
            s += 1
        while e > s and text[e - 1].isspace():
            e -= 1
    else:
        while s < e and text[s] in chars:
            s += 1
        while e > s and text[e - 1] in chars:
            e -= 1
    return (s, e)
