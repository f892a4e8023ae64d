"""XmlHelper over span-indexed XML: namespaces, qualified names, ancestor
search, text spans.

Re-expresses ``/root/reference/pawpaw/xml/xml_helper.py:15-249``
(QualifiedName, get_xmlns / get_prefix_map / get_default_namespace,
get_local_name / get_namespace, find-descendant-by-local-name,
get_text_itos, get_parent_element, reverse_find) over the flat
``(start, stop, desc, parent)`` node table produced by
:func:`pawpaw_ray.kernels.xmlspans.parse_xml_spans` — no ET objects, just
span arithmetic, so the helper runs row-local inside ``map_batches``.

Beyond the reference, :func:`resolve_tag` resolves a node's prefix through
the in-scope ``xmlns`` declarations to Clark notation (``{uri}local``),
which is what namespace-aware consumers (and the differential test's
stdlib-ET oracle) compare against.
"""

from __future__ import annotations

from typing import Callable, Iterable, NamedTuple

from pawpaw_ray.kernels.xmlspans import (
    ATTRIBUTE,
    ATTRIBUTES,
    ELEMENT,
    NAME,
    NAMESPACE,
    START_TAG,
    TAG,
    TEXT,
    VALUE,
)

Span = tuple[int, int]


class QualifiedName(NamedTuple):
    """``prefix:local_part`` spans (prefix None when unqualified) —
    ``xml_helper.py:15-38``."""
    prefix: Span | None
    local_part: Span

    def fmt(self, text: str) -> str:
        if self.prefix is None:
            return text[slice(*self.local_part)]
        return text[self.prefix[0]:self.local_part[1]]


def qualified_name_from_src(src: str) -> tuple[str | None, str]:
    """String form of ``QualifiedName.from_src``: split on the first ':'."""
    parts = src.split(":", 1)
    return (None, parts[0]) if len(parts) == 1 else (parts[0], parts[1])


# ---------------------------------------------------------------------------
# node-table navigation
# ---------------------------------------------------------------------------

def children_of(nodes, idx: int, desc: str | None = None) -> list[int]:
    return [i for i, n in enumerate(nodes)
            if n[3] == idx and (desc is None or n[2] == desc)]


def _first_child(nodes, idx: int, desc: str) -> int | None:
    for i, n in enumerate(nodes):
        if n[3] == idx and n[2] == desc:
            return i
    return None


def parent_element(nodes, idx: int) -> int | None:
    """Nearest strict ancestor with desc ``element``
    (``xml_helper.py:202-212``)."""
    p = nodes[idx][3]
    while p >= 0:
        if nodes[p][2] == ELEMENT:
            return p
        p = nodes[p][3]
    return None


def element_indices(nodes) -> list[int]:
    """All ``element`` nodes in document (preorder) order."""
    return [i for i, n in enumerate(nodes) if n[2] == ELEMENT]


def child_elements(nodes, el_idx: int) -> list[int]:
    return children_of(nodes, el_idx, ELEMENT)


# ---------------------------------------------------------------------------
# qualified names / tags
# ---------------------------------------------------------------------------

def get_qualified_name(nodes, idx: int) -> QualifiedName:
    """For a ``start_tag`` or ``attribute`` node: its namespace-prefix and
    name spans (``xml_helper.py:83-93``)."""
    if nodes[idx][2] not in (START_TAG, ATTRIBUTE):
        raise ValueError(f"node {idx} is {nodes[idx][2]!r}, "
                         f"want {START_TAG!r} or {ATTRIBUTE!r}")
    tag = _first_child(nodes, idx, TAG)
    ns = _first_child(nodes, tag, NAMESPACE) if tag is not None else None
    name = _first_child(nodes, tag, NAME) if tag is not None else None
    if name is None:
        raise ValueError(f"node {idx} has no name child")
    return QualifiedName(
        None if ns is None else (nodes[ns][0], nodes[ns][1]),
        (nodes[name][0], nodes[name][1]))


def get_local_name(tag: str) -> str:
    """Clark-notation local part (``xml_helper.py:158-168``)."""
    i = tag.find("}")
    return tag[i + 1:] if i >= 0 else tag


def get_namespace(tag: str) -> str | None:
    """Clark-notation ``{uri}`` part (``xml_helper.py:170-180``)."""
    i = tag.find("}")
    return tag[:i + 1] if i >= 0 else None


# ---------------------------------------------------------------------------
# xmlns declarations
# ---------------------------------------------------------------------------

def _start_tag_of(nodes, el_idx: int) -> int | None:
    return _first_child(nodes, el_idx, START_TAG)


def _attributes_of(nodes, el_idx: int) -> list[int]:
    st = _start_tag_of(nodes, el_idx)
    if st is None:
        return []
    attrs = _first_child(nodes, st, ATTRIBUTES)
    return [] if attrs is None else children_of(nodes, attrs, ATTRIBUTE)


def get_xmlns(text: str, nodes, el_idx: int) -> dict[QualifiedName, Span]:
    """The element's ``xmlns`` / ``xmlns:prefix`` declarations:
    QualifiedName → value span (``xml_helper.py:107-121``)."""
    rv: dict[QualifiedName, Span] = {}
    for a in _attributes_of(nodes, el_idx):
        qn = get_qualified_name(nodes, a)
        full = qn.fmt(text)
        if full == "xmlns" or full.startswith("xmlns:"):
            val = _first_child(nodes, a, VALUE)
            if val is not None:
                rv[qn] = (nodes[val][0], nodes[val][1])
    return rv


def get_prefix_map(text: str, nodes, el_idx: int) -> dict[str, str]:
    """``{prefix: uri}`` for prefixed declarations on this element
    (``xml_helper.py:123-135``)."""
    return {text[slice(*qn.local_part)]: text[slice(*val)]
            for qn, val in get_xmlns(text, nodes, el_idx).items()
            if qn.prefix is not None}


def get_default_namespace(text: str, nodes, el_idx: int) -> str | None:
    """Nearest in-scope default ``xmlns`` as ``{uri}``, walking ancestors
    (``xml_helper.py:137-145``).  ``xmlns=""`` UN-declares the default
    namespace (XML-names §6.2): the nearest declaration wins, and an empty
    one means None."""
    cur: int | None = el_idx
    while cur is not None:
        for qn, val in get_xmlns(text, nodes, cur).items():
            if qn.prefix is None:
                uri = text[slice(*val)]
                return "{" + uri + "}" if uri else None
        cur = parent_element(nodes, cur)
    return None


def in_scope_prefix_map(text: str, nodes, el_idx: int) -> dict[str, str]:
    """All prefixed declarations visible at this element (outer-to-inner,
    inner wins)."""
    chain = []
    cur: int | None = el_idx
    while cur is not None:
        chain.append(cur)
        cur = parent_element(nodes, cur)
    rv: dict[str, str] = {}
    for el in reversed(chain):
        rv |= get_prefix_map(text, nodes, el)
    return rv


def resolve_tag(text: str, nodes, el_idx: int) -> str:
    """Element tag in Clark notation ``{uri}local`` via in-scope
    declarations (unprefixed names take the in-scope default namespace) —
    the namespace-aware view a Clark-notation consumer expects."""
    st = _start_tag_of(nodes, el_idx)
    qn = get_qualified_name(nodes, st)
    local = text[slice(*qn.local_part)]
    if qn.prefix is not None:
        uri = in_scope_prefix_map(text, nodes, el_idx).get(
            text[slice(*qn.prefix)])
        return f"{{{uri}}}{local}" if uri else local
    default = get_default_namespace(text, nodes, el_idx)
    return f"{default}{local}" if default else local


def resolve_attributes(text: str, nodes, el_idx: int) -> dict[str, str]:
    """Attribute map with namespace-resolved names (unprefixed attribute
    names are NOT in the default namespace, per the XML-names spec);
    ``xmlns`` declarations excluded, matching ET's attrib view."""
    pm = None
    rv: dict[str, str] = {}
    for a in _attributes_of(nodes, el_idx):
        qn = get_qualified_name(nodes, a)
        full = qn.fmt(text)
        if full == "xmlns" or full.startswith("xmlns:"):
            continue
        val = _first_child(nodes, a, VALUE)
        sval = "" if val is None else text[nodes[val][0]:nodes[val][1]]
        if qn.prefix is None:
            rv[full] = sval
        else:
            if pm is None:
                pm = in_scope_prefix_map(text, nodes, el_idx)
            uri = pm.get(text[slice(*qn.prefix)])
            local = text[slice(*qn.local_part)]
            rv[f"{{{uri}}}{local}" if uri else full] = sval
    return rv


# ---------------------------------------------------------------------------
# text / search
# ---------------------------------------------------------------------------

def get_text_spans(nodes, el_idx: int) -> list[int]:
    """Direct ``text`` children (``xml_helper.py:198-200``)."""
    return children_of(nodes, el_idx, TEXT)


def element_head_text(text: str, nodes, el_idx: int) -> str | None:
    """ET ``.text`` semantics: the text run between the start tag and the
    first child element (None if absent).  Parse with
    ``ignore_empties=False`` for exact ET parity."""
    st = _start_tag_of(nodes, el_idx)
    st_stop = nodes[st][1]
    first_el = None
    for c in child_elements(nodes, el_idx):
        first_el = nodes[c][0]
        break
    for t in get_text_spans(nodes, el_idx):
        t_start, t_stop = nodes[t][0], nodes[t][1]
        if t_start == st_stop and (first_el is None or t_stop <= first_el):
            return text[t_start:t_stop]
    return None


def find_all_descendants_by_local_name(text: str, nodes, el_idx: int,
                                       local_name: str) -> Iterable[int]:
    """Descendant elements whose local name matches
    (``xml_helper.py:182-192``); preorder."""
    for i in element_indices(nodes):
        if i == el_idx:
            continue
        p = parent_element(nodes, i)
        while p is not None and p != el_idx:
            p = parent_element(nodes, p)
        if p != el_idx:
            continue
        st = _start_tag_of(nodes, i)
        qn = get_qualified_name(nodes, st)
        if text[slice(*qn.local_part)] == local_name:
            yield i


def find_descendant_by_local_name(text: str, nodes, el_idx: int,
                                  local_name: str) -> int | None:
    return next(find_all_descendants_by_local_name(text, nodes, el_idx,
                                                   local_name), None)


def _match_predicate(text: str, nodes, el_idx: int, predicate) -> bool:
    """reverse_find predicates: a callable ``(el_idx) -> bool``; ``'@name'``
    (attribute exists, local or Clark name); or a child-element test by
    name (local or Clark ``{uri}local``)."""
    if callable(predicate):
        return predicate(el_idx)
    if predicate.startswith("@"):
        want = predicate[1:]
        attrs = resolve_attributes(text, nodes, el_idx)
        return want in attrs or want in {get_local_name(k) for k in attrs}
    for c in child_elements(nodes, el_idx):
        if predicate.startswith("{"):
            if resolve_tag(text, nodes, c) == predicate:
                return True
        else:
            st = _start_tag_of(nodes, c)
            qn = get_qualified_name(nodes, st)
            if text[slice(*qn.local_part)] == predicate:
                return True
    return False


def reverse_find(text: str, nodes, el_idx: int,
                 predicate: str | Callable) -> int | None:
    """Walk UP from the element until the predicate passes
    (``xml_helper.py:214-249``)."""
    cur: int | None = el_idx
    while cur is not None:
        if _match_predicate(text, nodes, cur, predicate):
            return cur
        cur = parent_element(nodes, cur)
    return None
