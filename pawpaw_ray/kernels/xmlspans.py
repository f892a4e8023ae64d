"""Span-indexed XML parsing: XML text → flat span tree.

Re-expresses the reference's expat-hooked parser
(``/root/reference/pawpaw/xml/xml_parser.py:12-190`` — records byte/char
offsets at element start/end events, then derives start_tag / tag /
namespace / name / attributes / attribute / value / text / end_tag /
pi / comment sub-spans) as a standalone expat driver emitting the engine's
flat preorder ``(start, stop, desc, parent)`` nodes.  Desc vocabulary
matches the reference's ``xml.descriptors``.

Used as an MB extractor for XML-ish tool payloads (SURVEY.md §2.9);
row-local, no Ray dependency here.
"""

from __future__ import annotations

import xml.parsers.expat as expat

import regex as rx

from pawpaw_ray.kernels.spans import Node, Span

# descriptors (reference pawpaw/xml/descriptors.py)
ELEMENT, START_TAG, END_TAG = "element", "start_tag", "end_tag"
TAG, NAMESPACE, NAME = "tag", "namespace", "name"
ATTRIBUTES, ATTRIBUTE, VALUE, TEXT = "attributes", "attribute", "value", "text"
PI, COMMENT = "pi", "comment"

_TAG_RE = rx.compile(
    r"\<[\/\?]?(?P<tag>(?:(?P<namespace>[^ :<>]+):)?(?P<name>[^ \/>=]+))",
    rx.DOTALL)
_ATTR_RE = rx.compile(
    r"(?P<attribute>(?P<tag>(?:(?P<namespace>[^ :=]+):)?(?P<name>[^ \/>=]+))"
    r'="(?P<value>[^"]*)")',
    rx.DOTALL)
_PI_COMMENT_RE = rx.compile(
    r"(?P<pi>\<\?(?P<pival>.*?)\?\>)|(?P<comment>\<\!\-\-(?P<cval>.*?)\-\-\>)",
    rx.DOTALL)


def _scan_tag_end(text: str, start: int) -> int:
    """Index just past the '>' closing the tag opened at ``start``,
    skipping quoted attribute values (a '>' inside quotes is legal XML)."""
    i = start
    in_q: str | None = None
    while i < len(text):
        c = text[i]
        if in_q:
            if c == in_q:
                in_q = None
        elif c in "\"'":
            in_q = c
        elif c == ">":
            return i + 1
        i += 1
    raise ValueError(f"unterminated tag at {start}")


class _Elem:
    __slots__ = ("char_start", "char_stop", "children")

    def __init__(self, char_start: int):
        self.char_start = char_start
        self.char_stop = -1
        self.children: list[_Elem] = []


def _parse_element_events(text: str, encoding: str = "utf-8") -> _Elem:
    """expat pass: per element, the char offset of its '<' and of its end
    event (start of the end tag; for self-closing, inside the start tag)."""
    data = text.encode(encoding)
    p = expat.ParserCreate(encoding)

    # incremental byte→char offset conversion (monotonically increasing)
    state = {"byte": 0, "char": 0}

    def char_of(byte_off: int) -> int:
        if byte_off < state["byte"]:
            return len(data[:byte_off].decode(encoding))
        state["char"] += len(data[state["byte"]:byte_off].decode(encoding))
        state["byte"] = byte_off
        return state["char"]

    stack: list[_Elem] = []
    root: list[_Elem] = []

    def on_start(name, attrs):
        e = _Elem(char_of(p.CurrentByteIndex))
        (stack[-1].children if stack else root).append(e)
        stack.append(e)

    def on_end(name):
        e = stack.pop()
        e.char_stop = char_of(p.CurrentByteIndex)

    p.StartElementHandler = on_start
    p.EndElementHandler = on_end
    p.Parse(data, True)
    if not root:
        raise ValueError("no root element")
    return root[0]


def parse_xml_spans(text: str, ignore_empties: bool = True) -> list[Node]:
    """XML document → flat preorder span nodes (root ``element`` first)."""
    root = _parse_element_events(text)
    nodes: list[Node] = []

    def emit(start: int, stop: int, desc: str, parent: int) -> int:
        nodes.append((start, stop, desc, parent))
        return len(nodes) - 1

    def emit_text(start: int, stop: int, parent: int) -> None:
        if stop <= start:
            return
        seg = text[start:stop]
        if ignore_empties and seg.isspace():
            return
        t_idx = emit(start, stop, TEXT, parent)
        for m in _PI_COMMENT_RE.finditer(text, pos=start, endpos=stop):
            if m.span(PI) != (-1, -1):
                p_idx = emit(*m.span(PI), PI, t_idx)
                emit(*m.span("pival"), VALUE, p_idx)
            else:
                c_idx = emit(*m.span(COMMENT), COMMENT, t_idx)
                emit(*m.span("cval"), VALUE, c_idx)

    def walk(e: _Elem, parent: int) -> None:
        st_stop = _scan_tag_end(text, e.char_start)
        self_closing = text[st_stop - 2:st_stop] == "/>"

        if self_closing:
            el_stop = st_stop
        else:
            et_stop = _scan_tag_end(text, e.char_stop)
            el_stop = et_stop
        el_idx = emit(e.char_start, el_stop, ELEMENT, parent)

        st_idx = emit(e.char_start, st_stop, START_TAG, el_idx)
        # tag (namespace:name) of the start tag
        m = _TAG_RE.match(text, e.char_start)
        if m:
            t_idx = emit(*m.span("tag"), TAG, st_idx)
            if m.span("namespace") != (-1, -1):
                emit(*m.span("namespace"), NAMESPACE, t_idx)
            emit(*m.span("name"), NAME, t_idx)
        # attributes
        attrs = []
        for am in _ATTR_RE.finditer(text, pos=m.end("tag") if m else e.char_start,
                                    endpos=st_stop):
            attrs.append(am)
        if attrs:
            a_parent = emit(attrs[0].start("attribute"),
                            attrs[-1].end("attribute"), ATTRIBUTES, st_idx)
            for am in attrs:
                at_idx = emit(*am.span("attribute"), ATTRIBUTE, a_parent)
                t_idx = emit(*am.span("tag"), TAG, at_idx)
                if am.span("namespace") != (-1, -1):
                    emit(*am.span("namespace"), NAMESPACE, t_idx)
                emit(*am.span("name"), NAME, t_idx)
                emit(*am.span("value"), VALUE, at_idx)

        if self_closing:
            return st_stop

        # children + interleaved text
        cursor = st_stop
        for child in e.children:
            emit_text(cursor, child.char_start, el_idx)
            cursor = walk(child, el_idx)
        emit_text(cursor, e.char_stop, el_idx)

        # end tag
        et_idx = emit(e.char_stop, el_stop, END_TAG, el_idx)
        m = _TAG_RE.match(text, e.char_stop)
        if m:
            t_idx = emit(*m.span("tag"), TAG, et_idx)
            if m.span("namespace") != (-1, -1):
                emit(*m.span("namespace"), NAMESPACE, t_idx)
            emit(*m.span("name"), NAME, t_idx)
        return el_stop

    walk(root, -1)
    return nodes
