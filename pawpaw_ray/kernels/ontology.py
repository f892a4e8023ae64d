"""Hierarchical ontology with per-node rule callables → Discoveries tree.

Reference semantics (``/root/reference/pawpaw/ontology/ontology.py:10-70``,
tests ``/root/reference/tests/ontology/test_ontology.py``): an ``Ontology``
is a nested dict of concept nodes, each carrying arbitrary ``rules`` —
callables mapping a span to discovered sub-spans (typically arborform
itorators).  ``discover`` applies every node's rules to the input spans and
returns a ``Discoveries`` tree of the same shape; ``ont[path_tuple]``
indexes nested nodes; ``Discoveries.flatten()`` yields ``{path: spans}``.

Ray-side differences, by design:

* Rules are ``fn(text, node) -> Iterable[ANode]`` (our span-node
  convention; the reference binds text inside ``Ito``).  Any
  :class:`pawpaw_ray.kernels.arborform.Itor` is a valid rule.
* Ontologies are expressible as plain-data specs (``build_ontology``) so a
  pipeline can ship them to workers and compile ONCE per process — the
  same pipeline-as-data story as ``build_itor``.  Spec rules are itor
  specs; callables registered via ``register_itor_fn`` work through
  ``{"itor": "func", "name": ...}``.

Round-1 gap closed: ``stages/link.py``'s AliasIndex was one flat
casefolded dict — path-structured lookup and user rule callables now live
here, differentially tested against ``Ontology.discover``.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

from pawpaw_ray.kernels.arborform import ANode, Itor, build_itor


class Discoveries(dict):
    """Result tree of :meth:`Ontology.discover` — mirrors the ontology's
    shape; each node holds the spans its rules matched (``ontology.py:
    10-35``)."""

    def __init__(self, *args, **kwargs):
        self._nodes: list[ANode] = list(kwargs.pop("nodes", ()))
        dict.__init__(self, *args, **kwargs)

    def __missing__(self, key):
        # path access mirrors Ontology (handy on results: d['vehicle','car'])
        if isinstance(key, Sequence) and not isinstance(key, str) and key:
            rv = self[key[0]]
            return rv[key[1:]] if len(key) > 1 else rv
        raise KeyError(key)

    @property
    def nodes(self) -> list[ANode]:
        return self._nodes

    def _flatten(self, filter_empties: bool, path: tuple):
        rv = {} if filter_empties and not self._nodes else {path: self._nodes}
        for key, child in self.items():
            rv |= child._flatten(filter_empties, path + (key,))
        return rv

    def flatten(self, filter_empties: bool = True) -> dict[tuple, list[ANode]]:
        """``{concept_path: [nodes]}`` — empty paths dropped by default
        (``ontology.py:23-30``)."""
        return self._flatten(filter_empties, tuple())

    def walk(self) -> Iterable[ANode]:
        """Preorder node stream (``ontology.py:32-35``)."""
        yield from self._nodes
        for child in self.values():
            yield from child.walk()


class Ontology(dict):
    """Nested concept tree; values are child Ontologies, ``rules`` is this
    node's list of ``fn(text, node) -> Iterable[ANode]``."""

    def __missing__(self, key):
        # ont['vehicle','car'] == ont['vehicle']['car']  (ontology.py:39-46)
        if isinstance(key, Sequence) and not isinstance(key, str) and key:
            rv = self[key[0]]
            return rv[key[1:]] if len(key) > 1 else rv
        raise KeyError(key)

    def __init__(self, *args, **kwargs):
        self._rules: list[Callable] = list(kwargs.pop("rules", []))
        dict.__init__(self, *args, **kwargs)

    @property
    def rules(self) -> list[Callable]:
        return self._rules

    def discover(self, text: str, *nodes: ANode) -> Discoveries:
        """Apply every node's rules to every input span; results land at the
        matching concept path (``ontology.py:60-70``)."""
        rv = Discoveries()
        for rule in self._rules:
            for n in nodes:
                rv.nodes.extend(rule(text, n))
        for key, child in self.items():
            rv[key] = child.discover(text, *nodes)
        return rv

    def discover_text(self, text: str) -> Discoveries:
        """Convenience: discover over one span covering the whole text."""
        return self.discover(text, ANode(0, len(text)))


def build_ontology(spec: dict) -> Ontology:
    """Compile a plain-data ontology spec:

        {"rules": [<itor spec>, ...],
         "children": {"vehicle": {...}, ...}}

    Rules may also be ready callables / Itors (library use); regexes inside
    itor specs compile once here, not per call."""
    rules = [r if callable(r) or isinstance(r, Itor) else build_itor(r)
             for r in spec.get("rules", ())]
    children = {k: build_ontology(v)
                for k, v in spec.get("children", {}).items()}
    return Ontology(children, rules=rules)


def discoveries_to_rows(disc: Discoveries, sep: str = "/"):
    """Flatten a Discoveries tree to mention tuples
    ``(path_str, start, stop)`` in path order — the Arrow-friendly edge."""
    out = []
    for path, nodes in disc.flatten(filter_empties=True).items():
        p = sep.join(path)
        out.extend((p, n.start, n.stop) for n in nodes)
    return out
