"""Generalized arborform connector DAG — pipeline-as-data over span trees.

Round 1 hardcoded the one SimpleNlp composition inside ``segment_text``;
this module is the general engine: a row-local interpreter for itorator
pipelines wired with predicate-gated connectors, matching the reference's
flow semantics (``/root/reference/pawpaw/arborform/itorator/itorator.py:
130-173``):

  * ``delegate``      — yield from sub(cur); stop the connection chain
  * ``recurse``       — sub(cur)'s results continue through the REMAINING
                        connections
  * ``subroutine``    — run sub(cur) exhaustively; cur continues (sub
                        mutates via children ops)
  * ``children_add``  — attach sub(cur) results as span-sorted children
  * ``children_add_hierarchical`` — attach nested by span containment
  * ``children_replace`` / ``children_delete``
  * predicates: callable | ``str`` (desc equality) | ``None`` (desc is None)
    | absent (always)

Trees are row-local, so the whole DAG runs inside one ``map_batches`` UDF —
the idiomatic Ray translation (SURVEY.md §3.1): Ray parallelizes across
blocks, the interpreter handles the per-row tree work.  Pipelines are
expressible as plain-data specs (``build_itor``) — the moral equivalent of
the reference's ``connections`` lists — and any itor can carry a
postorator (``stacked_reduce`` / ``windowed_join``), closing the round-1
gap where postorators existed only as kernels.

Differentially tested against reference arborform on the us_constitution
demo parser (``/root/reference/docs/demos/us_constitution/
us_constitution.py:16-55``) and a per-connector grid
(tests/test_arborform.py).
"""

from __future__ import annotations

import bisect
from itertools import chain
from typing import Callable, Iterable

import regex as rx

from pawpaw_ray.kernels.spans import (
    Retention,
    extract,
    gaps,
    nest_match,
    preferred_group_keys,
)

# ---------------------------------------------------------------------------
# node model (row-local; flattened to the Arrow spans column at the edge)
# ---------------------------------------------------------------------------


class ANode:
    """Mutable span-tree node — the interpreter's working representation of
    an Ito (``start``/``stop`` absolute into the row's text; children kept
    span-sorted and non-overlapping, the ChildItos invariant)."""

    __slots__ = ("start", "stop", "desc", "children")

    def __init__(self, start: int, stop: int, desc: str | None = None,
                 children: list["ANode"] | None = None):
        self.start = start
        self.stop = stop
        self.desc = desc
        self.children: list[ANode] = children or []

    def clone(self, start: int | None = None, stop: int | None = None,
              desc: str | None | type(...) = ..., clone_children: bool = True):
        return ANode(
            self.start if start is None else start,
            self.stop if stop is None else stop,
            self.desc if desc is ... else desc,
            [c.clone() for c in self.children] if clone_children else [],
        )

    def __repr__(self):  # debugging aid only
        return f"ANode({self.start},{self.stop},{self.desc!r},{len(self.children)}ch)"


def _child_keys(parent: ANode) -> list[int]:
    return [c.start for c in parent.children]


def add_child(parent: ANode, node: ANode) -> None:
    """Span-sorted, non-overlapping insert (``ChildItos.add``,
    ``/root/reference/pawpaw/ito.py:1532-1544``)."""
    i = bisect.bisect_left(_child_keys(parent), node.start)
    if i > 0 and parent.children[i - 1].stop > node.start:
        raise ValueError(f"overlapping child {node} after {parent.children[i-1]}")
    if i < len(parent.children) and parent.children[i].start < node.stop:
        raise ValueError(f"overlapping child {node} before {parent.children[i]}")
    parent.children.insert(i, node)


def add_child_hierarchical(parent: ANode, node: ANode) -> None:
    """Containment insert (``ChildItos.add_hierarchical``,
    ``/root/reference/pawpaw/ito.py:1546-1615``): descend to the deepest
    existing node that strictly contains the new span, adopt any existing
    children the new span covers, then span-sorted insert."""
    cur = parent
    descended = True
    while descended:
        descended = False
        for ch in cur.children:
            if ch.start <= node.start and node.stop <= ch.stop \
                    and not (ch.start == node.start and ch.stop == node.stop):
                cur = ch
                descended = True
                break
    adopted = [ch for ch in cur.children
               if node.start <= ch.start and ch.stop <= node.stop]
    for ch in adopted:
        cur.children.remove(ch)
        add_child(node, ch)
    add_child(cur, node)


# ---------------------------------------------------------------------------
# predicates
# ---------------------------------------------------------------------------

ALWAYS = lambda node, text: True  # noqa: E731

_PREDICATE_FNS: dict[str, Callable] = {}
_ITOR_FNS: dict[str, Callable] = {}


def register_predicate(name: str, fn: Callable) -> None:
    """Extension surface: ``fn(node, text) -> bool`` usable as
    ``{"fn": name}`` in pipeline specs."""
    _PREDICATE_FNS[name] = fn


def register_itor_fn(name: str, fn: Callable) -> None:
    """Extension surface (``Itorator.wrap`` analog): ``fn(text, node) ->
    Iterable[ANode]`` usable as ``{"itor": "func", "name": name}``."""
    _ITOR_FNS[name] = fn


def compile_predicate(spec) -> Callable:
    """Predicate DSL → ``fn(node, text) -> bool``.

    ``"x"`` → desc == "x"; ``None`` → desc is None (reference connector
    semantics); dicts compose: ``{"desc": x}``, ``{"startswith": s}``
    (``str_startswith`` over the node's span), ``{"desc_is_none": true}``,
    ``{"fn": name}``, ``{"all": [...]}, {"any": [...]}, {"not": ...}``."""
    if spec is None:
        return lambda node, text: node.desc is None
    if isinstance(spec, str):
        return lambda node, text, d=spec: node.desc == d
    if callable(spec):
        return spec
    if isinstance(spec, dict):
        if "fn" in spec:
            return _PREDICATE_FNS[spec["fn"]]
        if "all" in spec:
            ps = [compile_predicate(s) for s in spec["all"]]
            return lambda node, text: all(p(node, text) for p in ps)
        if "any" in spec:
            ps = [compile_predicate(s) for s in spec["any"]]
            return lambda node, text: any(p(node, text) for p in ps)
        if "not" in spec:
            p = compile_predicate(spec["not"])
            return lambda node, text: not p(node, text)
        if "desc_is_none" in spec:
            return lambda node, text: node.desc is None
        parts = []
        if "desc" in spec:
            parts.append(lambda node, text, d=spec["desc"]: node.desc == d)
        if "startswith" in spec:
            parts.append(lambda node, text, s=spec["startswith"]:
                         text.startswith(s, node.start, node.stop))
        if parts:
            return lambda node, text: all(p(node, text) for p in parts)
    raise ValueError(f"bad predicate spec: {spec!r}")


# ---------------------------------------------------------------------------
# itorators
# ---------------------------------------------------------------------------

_CONNECTOR_KINDS = {"delegate", "recurse", "subroutine", "children_add",
                    "children_add_hierarchical", "children_replace",
                    "children_delete"}


class Itor:
    """Pipeline step: ``_transform(text, node) -> Iterable[ANode]`` plus a
    connections list of ``(kind, sub_itor, predicate)`` and an optional
    postorator over the output stream."""

    def __init__(self):
        self.connections: list[tuple[str, "Itor", Callable]] = []
        self.postorator: Callable[[str, Iterable[ANode]], Iterable[ANode]] | None = None

    def connect(self, kind: str, itor: "Itor", predicate=ALWAYS) -> "Itor":
        if kind not in _CONNECTOR_KINDS:
            raise ValueError(f"unknown connector kind {kind!r}")
        self.connections.append((kind, itor, compile_predicate(predicate)
                                 if not callable(predicate) else predicate))
        return self

    def _transform(self, text: str, node: ANode) -> Iterable[ANode]:
        raise NotImplementedError

    def _post(self, text: str, nodes: Iterable[ANode]) -> Iterable[ANode]:
        if self.postorator is None:
            yield from nodes
        else:
            yield from self.postorator(text, nodes)

    def _flow(self, text: str, node: ANode, idx: int) -> Iterable[ANode]:
        if idx >= len(self.connections):
            yield node
            return
        kind, sub, pred = self.connections[idx]
        if not pred(node, text):
            yield from self._flow(text, node, idx + 1)
            return
        # NOTE: sub-pipelines receive the node itself, NOT a clone — only
        # the outermost __call__ clones (itorator.py:134-141,171-177): a
        # Desc target in a Delegate mutates the flowing node, by design
        if kind == "delegate":
            yield from sub._traverse(text, node)
        elif kind == "recurse":
            for out in sub._traverse(text, node):
                yield from self._flow(text, out, idx + 1)
        elif kind == "subroutine":
            for _ in sub._traverse(text, node):  # side effects on node
                pass
            yield from self._flow(text, node, idx + 1)
        else:  # children ops — results attach to node
            children = list(sub._traverse(text, node))
            if kind == "children_replace":
                node.children.clear()
            if kind in ("children_add", "children_replace"):
                for c in children:
                    add_child(node, c)
            elif kind == "children_add_hierarchical":
                for c in children:
                    add_child_hierarchical(node, c)
            else:  # children_delete: OBJECT identity, like ChildItos.remove
                # (ito.py:1483-1488) — the sub-itor must yield the actual
                # existing children (e.g. a Func filtering node.children)
                for c in children:
                    for j, existing in enumerate(node.children):
                        if existing is c:
                            del node.children[j]
                            break
                    else:
                        raise ValueError("children_delete target not found")
            yield from self._flow(text, node, idx + 1)

    def _traverse(self, text: str, node: ANode) -> Iterable[ANode]:
        yield from self._post(text, chain.from_iterable(
            self._flow(text, n, 0) for n in self._transform(text, node)))

    def __call__(self, text: str, node: ANode) -> Iterable[ANode]:
        yield from self._traverse(text, node.clone())


class Reflect(Itor):
    def _transform(self, text, node):
        yield node


class Desc(Itor):
    def __init__(self, desc: str | Callable):
        super().__init__()
        self._desc = desc

    def _transform(self, text, node):
        node.desc = self._desc(text, node) if callable(self._desc) else self._desc
        yield node


class Filter(Itor):
    def __init__(self, predicate):
        super().__init__()
        self._pred = compile_predicate(predicate) if not callable(predicate) else predicate

    def _transform(self, text, node):
        if self._pred(node, text):
            yield node


_DESC_FROM_GROUP = object()  # sentinel: desc defaults to the group key


class Extract(Itor):
    """``Ito.from_re`` over the node's span: per-match hierarchical group
    trees; default group filter excludes only group 0."""

    def __init__(self, pattern, limit: int | None = None,
                 desc=_DESC_FROM_GROUP, group_keys=None):
        super().__init__()
        self._pattern = pattern if hasattr(pattern, "finditer") else rx.compile(pattern, rx.DOTALL)
        self._limit = limit
        self._desc = desc
        self._group_keys = group_keys

    def _transform(self, text, node):
        desc_func = (None if self._desc is _DESC_FROM_GROUP
                     else (lambda m, gk, d=self._desc: d))
        flat = extract(text, (node.start, node.stop), self._pattern,
                       group_keys=self._group_keys, desc_func=desc_func,
                       limit=self._limit)
        # flat (start, stop, desc, parent) preorder → ANode roots
        nodes = [ANode(s, e, d) for s, e, d, _ in flat]
        for i, (_, _, _, p) in enumerate(flat):
            if p >= 0:
                add_child(nodes[p], nodes[i])
            else:
                yield nodes[i]


class Split(Itor):
    """The four-retention-mode splitter; the splitter side may be a regex
    (boundary = group-0 span, desc None) or another Itor whose outputs —
    WITH their subtrees — are the boundaries (``split.py:68-78,105-156``;
    boundary nodes are yielded as-is in ALL mode, which is how SimpleNlp's
    number trees enter the stream)."""

    def __init__(self, splitter, limit: int | None = None,
                 retention: Retention = Retention.NONE,
                 return_zero_split: bool = True, desc: str | None = None):
        super().__init__()
        if isinstance(splitter, Itor):
            self._splitter = splitter
        else:
            pattern = splitter if hasattr(splitter, "finditer") else rx.compile(splitter, rx.DOTALL)
            # group 0 with null desc — the reference's generated Extract
            # (split.py:70-76)
            self._splitter = Extract(pattern, desc=None, group_keys=[0])
        self._limit = limit
        self._retention = retention
        self._rzs = return_zero_split
        self._desc = desc

    def _transform(self, text, node):
        if self._limit == 0 and self._rzs:
            yield node.clone(desc=self._desc, clone_children=False)
            return
        out_count = 0
        prior: ANode | None = None
        emitted = False
        for cur in self._splitter(text, node):
            if self._limit is not None and out_count >= self._limit:
                break
            if prior is None:
                if self._retention == Retention.LEADING:
                    s = e = 0
                else:
                    s = node.start
                    e = cur.start if self._retention in (Retention.NONE, Retention.ALL) else cur.stop
            else:
                if self._retention in (Retention.NONE, Retention.ALL):
                    s, e = prior.stop, cur.start
                elif self._retention == Retention.LEADING:
                    s, e = prior.start, cur.start
                else:
                    s, e = prior.stop, cur.stop
            out_count += 1
            if s != e:
                emitted = True
                yield node.clone(s, e, self._desc, clone_children=False)
            if self._retention == Retention.ALL and cur.start < cur.stop:
                emitted = True
                yield cur
            prior = cur
        if prior is not None and self._retention != Retention.TRAILING:
            s = prior.stop if self._retention in (Retention.NONE, Retention.ALL) else prior.start
            if s != node.stop:
                emitted = True
                yield node.clone(s, node.stop, self._desc, clone_children=False)
        if prior is None and not emitted and self._rzs:
            yield node.clone(desc=self._desc, clone_children=False)


class Invert(Itor):
    """Gaps of the inner itorator's outputs (``invert.py:7-30``)."""

    def __init__(self, itor: Itor, desc: str | None = None):
        super().__init__()
        self._itor = itor
        self._desc = desc

    def _transform(self, text, node):
        non_gaps = [(n.start, n.stop) for n in self._itor(text, node)]
        for s, e in gaps((node.start, node.stop), non_gaps):
            yield ANode(s, e, self._desc)


class Nuco(Itor):
    """Null-coalesce: first inner itorator yielding >=1 result wins
    (``nuco.py:7-23``)."""

    def __init__(self, *itors: Itor):
        super().__init__()
        self._itors = itors

    def _transform(self, text, node):
        for itor in self._itors:
            results = list(itor(text, node))
            if results:
                yield from results
                return


class Func(Itor):
    """``Itorator.wrap`` analog: any ``fn(text, node) -> Iterable[ANode]``."""

    def __init__(self, fn: Callable):
        super().__init__()
        self._fn = fn

    def _transform(self, text, node):
        yield from self._fn(text, node)


# ---------------------------------------------------------------------------
# composite: SimpleNlp as a DAG of the primitives above
# ---------------------------------------------------------------------------

def simple_nlp_itor() -> Itor:
    """The SimpleNlp cascade built from interpreter primitives (mirrors
    ``/root/reference/pawpaw/nlp/nlp.py:475-499``): paragraph split →
    Children.Add(sentence split) → Children.Add(number split, ALL retention
    over the number Extract) → Delegate(word extract, desc is None)."""
    from pawpaw_ray.kernels.nlp import (
        NUMBER_RE, PARAGRAPH_RE, SENTENCE_RE, WORD_RE)

    para = Split(PARAGRAPH_RE, desc="paragraph")
    sent = Split(SENTENCE_RE, desc="sentence")
    para.connect("children_add", sent)
    num = Split(Extract(NUMBER_RE), retention=Retention.ALL)
    sent.connect("children_add", num)
    word = Extract(WORD_RE)
    num.connect("delegate", word, None)  # predicate None == desc is None
    return para


# ---------------------------------------------------------------------------
# pipeline-as-data: spec dict → Itor graph
# ---------------------------------------------------------------------------

def _postorator_from_spec(spec: dict):
    from pawpaw_ray.kernels.postorators import stacked_reduce, windowed_join

    kind = spec["kind"]
    if kind == "windowed_join":
        window = int(spec.get("window_size", 2))
        pred = spec.get("predicate")
        pred_fn = _PREDICATE_FNS[pred["fn"]] if isinstance(pred, dict) else None
        desc = spec.get("desc")

        def post(text, nodes):
            triples = ((n.start, n.stop, n.desc) for n in nodes)
            p = (lambda w: pred_fn(w, text)) if pred_fn else (lambda w: True)
            for s, e, d in windowed_join(triples, window, p, desc):
                yield ANode(s, e, d)

        return post
    if kind == "stacked_reduce":
        push = _PREDICATE_FNS[spec["push"]["fn"]]
        pop = _PREDICATE_FNS[spec["pop"]["fn"]] if "pop" in spec else None
        desc = spec.get("desc")

        def post(text, nodes):
            from pawpaw_ray.kernels.postorators import join_spans, stacked_reduce
            triples = ((n.start, n.stop, n.desc) for n in nodes)
            for s, e, d in stacked_reduce(
                    triples, lambda stack: join_spans(stack, desc),
                    lambda stack, s: push(stack, s),
                    (lambda stack, s: pop(stack, s)) if pop else None):
                yield ANode(s, e, d)

        return post
    raise ValueError(f"unknown postorator kind {kind!r}")


def build_itor(spec: dict) -> Itor:
    """Compile a plain-data pipeline spec into an Itor graph.

    ``{"itor": <kind>, ...params, "connections": [{"connector": <kind>,
    "predicate": <predicate spec, optional>, "itor": <nested spec>}],
    "postorator": {...}}``.  Regexes compile once at build time (specs are
    compiled per worker process, not per batch)."""
    kind = spec["itor"]
    flags = rx.DOTALL if spec.get("dotall", True) else 0
    if spec.get("ignorecase"):
        flags |= rx.IGNORECASE
    if kind == "split":
        splitter = (build_itor(spec["of"]) if "of" in spec
                    else rx.compile(spec["re"], flags))
        itor = Split(splitter, limit=spec.get("limit"),
                     retention=Retention[spec.get("retention", "none").upper()],
                     return_zero_split=spec.get("return_zero_split", True),
                     desc=spec.get("desc"))
    elif kind == "extract":
        itor = Extract(rx.compile(spec["re"], flags), limit=spec.get("limit"),
                       desc=spec.get("desc", _DESC_FROM_GROUP),
                       group_keys=spec.get("group_keys"))
    elif kind == "desc":
        d = spec.get("desc")
        if d is None and "fn" in spec:
            fn = _ITOR_FNS[spec["fn"]]
            itor = Desc(fn)
        else:
            itor = Desc(d)
    elif kind == "filter":
        itor = Filter(spec["predicate"])
    elif kind == "reflect":
        itor = Reflect()
    elif kind == "invert":
        itor = Invert(build_itor(spec["of"]), desc=spec.get("desc"))
    elif kind == "nuco":
        itor = Nuco(*(build_itor(s) for s in spec["of"]))
    elif kind == "func":
        itor = Func(_ITOR_FNS[spec["name"]])
    elif kind == "simple_nlp":
        itor = simple_nlp_itor()
    else:
        raise ValueError(f"unknown itor kind {kind!r}")

    for con in spec.get("connections", ()):
        pred = con["predicate"] if "predicate" in con else ALWAYS
        itor.connect(con["connector"], build_itor(con["itor"]), pred)
    if "postorator" in spec:
        itor.postorator = _postorator_from_spec(spec["postorator"])
    return itor


# ---------------------------------------------------------------------------
# flatten to the Arrow spans encoding
# ---------------------------------------------------------------------------

def flatten_tree(roots: Iterable[ANode], descs_to_ids: dict | None = None):
    """Preorder-flatten node trees → parallel lists (starts, stops, descs,
    parents); desc stays a string unless a vocabulary map is given."""
    starts, stops, descs, parents = [], [], [], []

    def walk(n: ANode, parent: int):
        idx = len(starts)
        starts.append(n.start)
        stops.append(n.stop)
        descs.append(descs_to_ids[n.desc] if descs_to_ids else n.desc)
        parents.append(parent)
        for c in n.children:
            walk(c, idx)

    for r in roots:
        walk(r, -1)
    return starts, stops, descs, parents


def run_pipeline(text: str, itor: Itor, root_desc: str | None = "Document"):
    """Reference invocation shape (``doc.children.add(*parser(doc))``): run
    the pipeline over a root node covering the text, attach results as the
    root's children, return the root."""
    root = ANode(0, len(text), root_desc)
    for out in itor(text, root):
        add_child(root, out)
    return root
