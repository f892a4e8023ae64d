"""Debug tree-render sink: pepo-style dumps of the flat ``spans`` column.

Re-expresses the reference's pepo dumpers
(``/root/reference/pawpaw/visualization/pepo/pepo.py:39-189`` —
``Compact`` / ``Tree`` / ``Xml`` / ``Json``) over the engine's flat
span-tree encoding (``list<struct{start,stop,desc,parent}>``,
``stages/segment.py``) instead of ``Ito`` object trees.  The per-node
format strings are the reference's own (``'%span %desc!r : ...'``),
expanded by the engine's ``__format__`` kernel (``kernels/fmt.py``), so
Compact/Tree lines match the reference byte-for-byte (pinned by
``tests/test_viz.py`` subprocess parity).

This is a *driver-side debugging* surface: ``show(ds, k)`` pulls only
``ds.limit(k)`` (never the full dataset) and prints renders — the first
thing a user reaches for when a parse looks wrong.
"""

from __future__ import annotations

import json as _json
import sys
from xml.sax.saxutils import escape as _xml_escape

from pawpaw_ray.kernels.fmt import format_span

# reference fstrs: pepo.py:41 (Compact) and pepo.py:68 (Tree)
COMPACT_FSTR = "%span %desc!r : '%substr!1r1:40…% '"
TREE_FSTR = "%span %desc!r : '%substr!1r1:^40…% '"

# box-drawing connectors, pepo.py:61-64
_HORZ, _VERT, _TEE, _ELBOW = "─", "│", "├", "└"

_LINESEP = "\n"  # deterministic (reference uses os.linesep)


def _nodes(spans, vocab) -> tuple[list[tuple[int, int, str]], dict[int, list[int]], list[int]]:
    """Normalize a row's spans into (node list, children adjacency, roots).

    ``spans`` is an iterable of ``{start, stop, desc, parent}`` dicts (the
    Arrow struct as returned by ``.to_pylist()``).  ``desc`` may be an int
    index into ``vocab`` or already a string; ``parent`` < 0 marks a root.
    Children keep input (preorder) order, matching ``Ito.children``.
    """
    nodes: list[tuple[int, int, str]] = []
    children: dict[int, list[int]] = {}
    roots: list[int] = []
    for i, sp in enumerate(spans):
        d = sp["desc"]
        if not isinstance(d, str):
            d = vocab[d] if (vocab and 0 <= d < len(vocab)) else str(d)
        nodes.append((sp["start"], sp["stop"], d))
        p = sp.get("parent", -1)
        p = -1 if p is None else p
        (roots if p < 0 else children.setdefault(p, [])).append(i)
    return nodes, children, roots


def _fmt(fstr: str, text: str, node: tuple[int, int, str]) -> str:
    start, stop, desc = node
    return format_span(fstr, text, start, stop, desc or None)


def render_compact(text: str, spans, vocab=None, indent: str = "    ") -> str:
    """``pepo.Compact``: one indented ``index: %span %desc : 'substr'``
    line per node, sibling index 1-based (pepo.py:44-56)."""
    nodes, children, roots = _nodes(spans, vocab)
    out: list[str] = []

    def dump(i: int, sib_idx: int, level: int) -> None:
        out.append(f"{indent * level}{sib_idx:,}: "
                   f"{_fmt(COMPACT_FSTR, text, nodes[i])}{_LINESEP}")
        for ci, c in enumerate(children.get(i, ()), start=1):
            dump(c, ci, level + 1)

    for ri, r in enumerate(roots, start=1):
        dump(r, ri, 0)
    return "".join(out)


def render_tree(text: str, spans, vocab=None, indent: str = "  ") -> str:
    """``pepo.Tree``: box-drawing connectors (pepo.py:59-93)."""
    nodes, children, roots = _nodes(spans, vocab)
    out: list[str] = []

    def dump_children(i: int, prefix: str) -> None:
        kids = children.get(i, ())
        for k, c in enumerate(kids):
            last = k == len(kids) - 1
            out.append(f"{prefix}{_ELBOW if last else _TEE}"
                       f"{_HORZ * len(indent)}"
                       f"{_fmt(TREE_FSTR, text, nodes[c])}{_LINESEP}")
            dump_children(c, prefix + (" " if last else _VERT) + indent)

    for r in roots:
        out.append(f"{_fmt(TREE_FSTR, text, nodes[r])}{_LINESEP}")
        dump_children(r, "")
    return "".join(out)


def render_xml(text: str, spans, vocab=None, indent: str = "    ") -> str:
    """``pepo.Xml``: nested ``<ito>`` elements (pepo.py:96-130; keeps the
    reference's quirks: no level increment before <substring>, unclosed
    trailing ``<itos>``)."""
    nodes, children, roots = _nodes(spans, vocab)
    out: list[str] = [f'<?xml version="1.0" encoding="UTF-8" ?>{_LINESEP}',
                      f"<itos>{_LINESEP}"]

    def dump(i: int, level: int) -> None:
        start, stop, desc = nodes[i]
        out.append(f'{level * indent}<ito start="{start}" stop="{stop}" '
                   f'desc="{_xml_escape(desc or "")}">{_LINESEP}')
        out.append(f"{level * indent}<substring>"
                   f"{_xml_escape(text[start:stop])}</substring>{_LINESEP}")
        kids = children.get(i, ())
        if kids:
            out.append(f"{level * indent}<children>{_LINESEP}")
            for c in kids:
                dump(c, level + 1)
            out.append(f"{level * indent}</children>{_LINESEP}")
        out.append(f"{(level - 1) * indent}</ito>{_LINESEP}")

    for r in roots:
        dump(r, 1)
    out.append(f"<itos>{_LINESEP}")
    return "".join(out)


def render_json(text: str, spans, vocab=None, indent: str = "    ") -> str:
    """``pepo.Json``: nested objects with start/stop/desc/substr/children
    (pepo.py:133-189)."""
    nodes, children, roots = _nodes(spans, vocab)
    out: list[str] = []

    def dump(i: int, level: int) -> None:
        start, stop, desc = nodes[i]
        out.append(level * indent + "{" + _LINESEP)
        level += 1
        out.append(f'{level * indent}"start": {start},{_LINESEP}')
        out.append(f'{level * indent}"stop": {stop},{_LINESEP}')
        d = "null" if not desc else _json.encoder.encode_basestring(desc)
        out.append(f'{level * indent}"desc": {d},{_LINESEP}')
        substr = _json.encoder.encode_basestring(text[start:stop])
        out.append(f'{level * indent}"substr": {substr},{_LINESEP}')
        kids = children.get(i, ())
        out.append(f'{level * indent}"children": [')
        if not kids:
            out.append(f"]{_LINESEP}")
        else:
            out.append(_LINESEP)
            level += 1
            for k, c in enumerate(kids):
                dump(c, level)
                if k < len(kids) - 1:
                    out.append(",")
                out.append(_LINESEP)
            level -= 1
            out.append(f"{level * indent}]{_LINESEP}")
        level -= 1
        out.append(level * indent + "}")

    out.append("{" + _LINESEP + f'{indent}"itos": [')
    for k, r in enumerate(roots):
        if k:
            out.append(",")
        out.append(_LINESEP)
        dump(r, 2)
    out.append(_LINESEP + indent + "]" + _LINESEP + "}" + _LINESEP)
    return "".join(out)


_BACK_RESET = "\x1b[49m"
_DEFAULT_PALETTE = tuple(f"\x1b[{n}m" for n in (41, 42, 43, 44, 45, 46))


def render_highlight(text: str, spans, vocab=None,
                     palette=_DEFAULT_PALETTE, predicate=None) -> str:
    """``visualization.Highlighter`` analog
    (``/root/reference/pawpaw/visualization/highlighter.py:8-51``): ANSI
    background colors over the span tree, guaranteed to differ across any
    node boundary.  Same traversal as the reference — depth-first; a
    parent's text not covered by children is emitted as its own segments;
    every emitted segment (passing ``predicate``, by desc) advances the
    color cycle.  Stripping the SGR codes recovers the text exactly."""
    from itertools import cycle

    nodes, children, roots = _nodes(spans, vocab)
    backs = cycle(palette)
    out: list[str] = []

    def compose(i: int, lo: int, hi: int) -> None:
        if lo >= hi:  # the reference emits nothing for empty segments
            return
        seg = text[lo:hi]
        if predicate is None or predicate(nodes[i][2]):
            out.append(f"{next(backs)}{seg}{_BACK_RESET}")
        else:
            out.append(seg)

    def walk(i: int) -> None:
        start, stop, _ = nodes[i]
        kids = children.get(i, ())
        if not kids:
            compose(i, start, stop)
            return
        last = start
        for c in kids:
            cs, cstop = nodes[c][0], nodes[c][1]
            if last < cs:
                compose(i, last, cs)
            walk(c)
            last = cstop
        if last < stop:
            compose(i, last, stop)

    for r in roots:
        walk(r)
    return "".join(out)


_STYLES = {"compact": render_compact, "tree": render_tree,
           "xml": render_xml, "json": render_json,
           "highlight": render_highlight}


def show(ds, k: int = 3, style: str = "tree", text_col: str = "text",
         spans_col: str = "spans", vocab=None, file=None) -> None:
    """Print pepo-style renders for the first ``k`` rows of ``ds``.

    Driver-side debug sink: pulls exactly ``ds.limit(k)`` — safe on a
    100 TB dataset.  ``vocab`` defaults to the segmentation stage's
    ``DESC_VOCAB`` when the desc field is integer-coded.
    """
    render = _STYLES[style]
    if vocab is None:
        from pawpaw_ray.kernels.nlp import DESC_VOCAB
        vocab = DESC_VOCAB
    file = file or sys.stdout
    for row in ds.limit(k).take(k):
        header = " ".join(
            f"{c}={row[c]!r}" for c in row
            if c not in (text_col, spans_col) and not hasattr(row[c], "__len__"))
        print(f"--- {header}" if header else "---", file=file)
        print(render(row[text_col], row[spans_col], vocab=vocab), end="",
              file=file)
