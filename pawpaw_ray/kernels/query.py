"""plumule-compatible structured query engine over flat span trees.

Re-implements the reference's XPath-like query language
(``/root/reference/pawpaw/query/_query.py``) as index arithmetic over the
engine's flat preorder span arrays (SURVEY.md §2.10): a *tree* here is
``(text, starts, stops, descs, parents)`` where ``parents`` holds the index
of each node's parent (-1 for roots) and nodes appear in preorder.

Path grammar (parity target — differential-tested against the reference
engine on identical trees):

    path   := phrase[/phrase]...
    phrase := [order]axis[or_self][filters][subqueries]
    axis   := ....|...|..|.|><|*|**|***|<<<|<<|<|>|>>|>>>
    order  := + | -            (reference ``Axis._re`` :85)
    or_self:= ! | !!           (fallback / always include self)
    filter := [~key:value] combined with ~ & ^ | and parens (:19-30,295-515)
    subq   := {path} existential, same boolean combining (:518-562)

Queries are compiled once (per worker process) and evaluated per row —
trees are row-local, so no shuffle is ever needed (SURVEY.md §2.10).

Known reference quirks reproduced for parity: the ``<<<`` and ``>>>``
(preceding / following) axes process only the LAST node of their input
stream, and return early on the first parentless node
(``_query.py:192-208,254-266`` — the processing block sits outside the
``for`` loop).
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import regex as rx

from pawpaw_ray.kernels.strutil import descape, find_unescaped, split_unescaped

# ---------------------------------------------------------------------------
# tree view
# ---------------------------------------------------------------------------


class TreeView:
    """Flat preorder span tree over one text (row-local, read-only)."""

    __slots__ = ("text", "starts", "stops", "descs", "parents", "_children")

    def __init__(self, text: str, starts, stops, descs: Sequence[str | None], parents):
        self.text = text
        self.starts = starts
        self.stops = stops
        self.descs = descs
        self.parents = parents
        ch: list[list[int]] = [[] for _ in range(len(starts))]
        for i, p in enumerate(parents):
            if p >= 0:
                ch[p].append(i)
        self._children = ch

    @classmethod
    def from_ids(cls, text: str, starts, stops, desc_ids, parents,
                 vocab: Sequence[str]) -> "TreeView":
        return cls(text, starts, stops, [vocab[d] for d in desc_ids], parents)

    def children(self, i: int) -> list[int]:
        return self._children[i]

    def substr(self, i: int) -> str:
        return self.text[self.starts[i]:self.stops[i]]

    def key(self, i: int) -> tuple:
        """Value-equality key — mirrors ``Ito.__eq__`` (span, desc, string
        shared per tree), ``/root/reference/pawpaw/ito.py:520-553``."""
        return (self.starts[i], self.stops[i], self.descs[i])

    def walk_descendants(self, i: int, reverse: bool = False) -> Iterable[int]:
        """Preorder descendants; ``reverse`` yields the exact mirror
        (``ito.py:1327-1336``)."""
        for c in (reversed(self._children[i]) if reverse else self._children[i]):
            if not reverse:
                yield c
            yield from self.walk_descendants(c, reverse)
            if reverse:
                yield c

    def root_of(self, i: int) -> int | None:
        p = self.parents[i]
        if p < 0:
            return None
        while self.parents[p] >= 0:
            p = self.parents[p]
        return p

    def ancestors(self, i: int) -> list[int]:
        out = []
        p = self.parents[i]
        while p >= 0:
            out.append(p)
            p = self.parents[p]
        return out


# ---------------------------------------------------------------------------
# filter leaves
# ---------------------------------------------------------------------------

# key aliases (reference FILTER_KEYS, _query.py:19-30)
_KEYS = {
    "desc": {"desc", "d"},
    "str": {"string", "s"},
    "str-casefold": {"str-casefold", "scf", "lcs"},
    "str-casefold-ew": {"str-casefold-ew", "scfew", "lcsew"},
    "str-casefold-sw": {"str-casefold-sw", "scfsw", "lcssw"},
    "str-ew": {"str-ew", "sew"},
    "str-sw": {"str-sw", "ssw"},
    "index": {"index", "i"},
    "predicate": {"predicate", "p"},
    "value": {"value", "v"},
}

_FILTER_RE = rx.compile(r"\[(?P<not>\~)?(?P<k>[a-z\-]+):\s*(?P<v>.+?)\]", rx.DOTALL)

# Ec = (enumeration_index, node_index); filter funcs close over tree/values/preds
FilterFn = Callable[[int, int, "TreeView", dict | None, dict | None], bool]


def _parse_index_ranges(value: str) -> list[tuple[float, float]]:
    ranges: list[tuple[float, float]] = []
    for chunk in value.split(","):
        vals = chunk.split("-")
        if len(vals) > 2:
            raise ValueError(f"invalid filter index value '{chunk}'")
        lo = int(vals[0])
        if len(vals) == 2:
            v2 = vals[1]
            if v2.isdigit():
                hi = int(v2)
            elif v2 == "" or v2.isspace():
                hi = float("inf")
            else:
                raise ValueError(f"invalid filter index value '{chunk}'")
            ranges.append((lo, hi))
        else:
            ranges.append((lo, lo + 1))
    return ranges


def _filter_leaf(not_: bool, key: str, value: str) -> FilterFn:
    """One ``[key:value]`` filter (reference ``EcfFilter._func``,
    ``_query.py:389-486``)."""
    if key in _KEYS["desc"]:
        vals = [descape(s) for s in split_unescaped(value, ",")]
        return lambda e, n, t, v, p: (t.descs[n] in vals) ^ not_
    if key in _KEYS["str"]:
        vals = [descape(s) for s in split_unescaped(value, ",")]
        return lambda e, n, t, v, p: (t.substr(n) in vals) ^ not_
    if key in _KEYS["str-casefold"]:
        vals = [descape(s).casefold() for s in split_unescaped(value.casefold(), ",")]
        return lambda e, n, t, v, p: (t.substr(n).casefold() in vals) ^ not_
    if key in _KEYS["str-casefold-ew"]:
        vals = [descape(s).casefold() for s in split_unescaped(value.casefold(), ",")]
        return lambda e, n, t, v, p: any(
            t.substr(n).casefold().endswith(s) for s in vals) ^ not_
    if key in _KEYS["str-casefold-sw"]:
        vals = [descape(s).casefold() for s in split_unescaped(value.casefold(), ",")]
        return lambda e, n, t, v, p: any(
            t.substr(n).casefold().startswith(s) for s in vals) ^ not_
    if key in _KEYS["str-ew"]:
        vals = [descape(s) for s in split_unescaped(value, ",")]
        return lambda e, n, t, v, p: any(t.substr(n).endswith(s) for s in vals) ^ not_
    if key in _KEYS["str-sw"]:
        vals = [descape(s) for s in split_unescaped(value, ",")]
        return lambda e, n, t, v, p: any(t.substr(n).startswith(s) for s in vals) ^ not_
    if key in _KEYS["index"]:
        ranges = _parse_index_ranges(value)
        return lambda e, n, t, v, p: any(lo <= e < hi for lo, hi in ranges) ^ not_
    if key in _KEYS["predicate"]:
        keys = [descape(s) for s in split_unescaped(value, ",")]
        # positive case is all(), matching the reference (:475-477)
        if not_:
            return lambda e, n, t, v, p: all(
                not f((e, n, t)) for k, f in _need(p, "predicates").items() if k in keys)
        return lambda e, n, t, v, p: all(
            f((e, n, t)) for k, f in _need(p, "predicates").items() if k in keys)
    if key in _KEYS["value"]:
        keys = [descape(s) for s in split_unescaped(value, ",")]
        # node value == its substring (typed values are eager columns here)
        return lambda e, n, t, v, p: (
            t.substr(n) in [val for k, val in _need(v, "values").items() if k in keys]
        ) ^ not_
    raise ValueError(f"unknown filter key '{key}'")


def _need(d: dict | None, what: str) -> dict:
    if d is None:
        raise ValueError(f"{what} expression found, however, no {what} dictionary supplied")
    return d


# ---------------------------------------------------------------------------
# boolean expression parsing (filters and subqueries share it)
# ---------------------------------------------------------------------------

def _outer_regions(s: str, lch: str, rch: str) -> list[tuple[int, int]]:
    """(start, stop) of outermost balanced ``lch...rch`` regions, escape-aware."""
    out: list[tuple[int, int]] = []
    depth = 0
    start = -1
    for i in find_unescaped(s, lch + rch):
        if s[i] == lch:
            if depth == 0:
                start = i
            depth += 1
        else:
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced '{rch}' in '{s}'")
            if depth == 0:
                out.append((start, i + 1))
    if depth != 0:
        raise ValueError(f"unbalanced '{lch}' in '{s}'")
    return out


def _parse_bool(section: str, lch: str, rch: str,
                leaf_fn: Callable[[str], FilterFn]) -> FilterFn:
    """Parse leaves combined with ``~ & ^ |`` + parens into one FilterFn.

    Precedence ~ > & > ^ > | with left associativity — the same result as
    the reference's repeated leftmost-highest-precedence combining
    (``EcfCombined.func``, ``_query.py:356-376``).
    """
    regions = _outer_regions(section, lch, rch)
    if not regions:
        raise ValueError(f"empty filters list in '{section}'")

    # token stream: leaves + operator chars between them
    tokens: list[object] = []  # FilterFn (leaf) | '~' '&' '^' '|' '(' ')'
    pos = 0
    for a, b in regions:
        for c in section[pos:a]:
            if c in "~&^|()":
                tokens.append(c)
            elif not c.isspace():
                raise ValueError(f"invalid character '{c}' in '{section}'")
        tokens.append(leaf_fn(section[a:b]))
        pos = b
    for c in section[pos:]:
        if c in "~&^|()":
            tokens.append(c)
        elif not c.isspace():
            raise ValueError(f"invalid character '{c}' in '{section}'")

    it = iter(range(len(tokens)))
    idx = [0]

    def peek():
        return tokens[idx[0]] if idx[0] < len(tokens) else None

    def take():
        tok = tokens[idx[0]]
        idx[0] += 1
        return tok

    def parse_primary() -> FilterFn:
        tok = peek()
        if tok == "(":
            take()
            f = parse_or()
            if peek() != ")":
                raise ValueError(f"unbalanced parentheses in '{section}'")
            take()
            return f
        if callable(tok):
            return take()
        raise ValueError(f"expected filter in '{section}'")

    def parse_unary() -> FilterFn:
        neg = False
        while peek() == "~":
            take()
            neg = not neg
        f = parse_primary()
        if neg:
            return lambda e, n, t, v, p: not f(e, n, t, v, p)
        return f

    def parse_and() -> FilterFn:
        f = parse_unary()
        while peek() == "&":
            take()
            g = parse_unary()
            f = (lambda a, b: lambda e, n, t, v, p:
                 a(e, n, t, v, p) and b(e, n, t, v, p))(f, g)
        return f

    def parse_xor() -> FilterFn:
        f = parse_and()
        while peek() == "^":
            take()
            g = parse_and()
            f = (lambda a, b: lambda e, n, t, v, p:
                 a(e, n, t, v, p) ^ b(e, n, t, v, p))(f, g)
        return f

    def parse_or() -> FilterFn:
        f = parse_xor()
        while peek() == "|":
            take()
            g = parse_xor()
            f = (lambda a, b: lambda e, n, t, v, p:
                 a(e, n, t, v, p) or b(e, n, t, v, p))(f, g)
        return f

    out = parse_or()
    if peek() is not None:
        raise ValueError(f"trailing tokens in '{section}'")
    return out


def _filter_leaf_fn(region: str) -> FilterFn:
    m = _FILTER_RE.fullmatch(region)
    if m is None:
        raise ValueError(f"invalid filter '{region}'")
    return _filter_leaf(m.group("not") == "~", m.group("k"), m.group("v"))


# ---------------------------------------------------------------------------
# phrases and axes
# ---------------------------------------------------------------------------

_AXIS_RE = rx.compile(
    r"(?P<order>[\+\-]?)(?P<key>\.{1,4}|\*{1,3}|\>\<|\<{1,3}|\>{1,3})"
    r"(?P<or_self>(?:\!{1,2})?)",
    rx.DOTALL,
)


class _Phrase:
    def __init__(self, phrase: str):
        m = _AXIS_RE.match(phrase)
        if m is None:
            raise ValueError(f"invalid phrase '{phrase}'")
        self.key = m.group("key")
        self.reverse = m.group("order") == "-"
        self.or_self = m.group("or_self") or None
        rest_start = m.end()

        unesc_curl = next(
            (i for i in find_unescaped(phrase, "{") if i >= rest_start),
            len(phrase))
        if phrase[unesc_curl:].strip():
            # back up over boolean operators that belong to the subquery
            # section (reference Phrase.__init__, _query.py:576-578)
            while phrase[unesc_curl - 1] in "~&^|() ":
                unesc_curl -= 1
            self.subq: FilterFn | None = _parse_bool(
                phrase[unesc_curl:].strip(), "{", "}", self._subquery_leaf)
        else:
            self.subq = None

        filt = phrase[rest_start:unesc_curl].strip()
        self.filt: FilterFn | None = (
            _parse_bool(filt, "[", "]", _filter_leaf_fn) if filt else None)

    @staticmethod
    def _subquery_leaf(region: str) -> FilterFn:
        sub = Query(region[1:-1])  # strip { }
        return lambda e, n, t, v, p: next(iter(sub.find_all(t, n, v, p)), None) is not None

    # -- axis evaluation ----------------------------------------------------

    def _to_ecs(self, items: Iterable[int], self_node: int | None,
                tree: TreeView) -> Iterable[tuple[int, int]]:
        """Enumerate axis output, applying or_self semantics
        (reference ``Axis.to_ecs``, ``_query.py:106-140``)."""
        it = iter(items)
        stopped = False
        e = 0
        if self.or_self == "!!" and self_node is not None and not self.reverse:
            try:
                first = next(it)
            except StopIteration:
                stopped = True
            if not stopped:
                yield (e, self_node)
                e += 1
                if first != self_node:
                    yield (e, first)
                    e += 1
        if not stopped:
            for i in it:
                yield (e, i)
                e += 1
        if e == 0:
            if self.or_self and self_node is not None:
                yield (e, self_node)
        elif self.or_self == "!!" and self_node is not None and self.reverse:
            yield (e, self_node)

    def _axis(self, tree: TreeView, stream: Iterable[int]) -> Iterable[tuple[int, int]]:
        key, rev = self.key, self.reverse
        if key == "....":
            for n in stream:
                root = tree.root_of(n)
                yield from self._to_ecs([] if root is None else [root], n, tree)
        elif key == "...":
            for n in stream:
                anc = tree.ancestors(n)
                yield from self._to_ecs(reversed(anc) if rev else anc, n, tree)
        elif key == "..":
            for n in stream:
                p = tree.parents[n]
                yield from self._to_ecs([] if p < 0 else [p], n, tree)
        elif key == ".":
            yield from self._to_ecs(stream, None, tree)
        elif key == "><":
            # value-equality dedup, order-preserving (reference uses
            # dict.fromkeys over Ito value equality, _query.py:173-177)
            seen: dict[tuple, int] = {}
            for n in stream:
                seen.setdefault(tree.key(n), n)
            uniq = list(seen.values())
            if rev:
                uniq.reverse()
            yield from self._to_ecs(uniq, None, tree)
        elif key == "*":
            for n in stream:
                ch = tree.children(n)
                yield from self._to_ecs(reversed(ch) if rev else ch, n, tree)
        elif key == "**":
            for n in stream:
                yield from self._to_ecs(tree.walk_descendants(n, rev), n, tree)
        elif key == "***":
            for n in stream:
                leaves = (d for d in tree.walk_descendants(n, rev)
                          if not tree.children(d))
                yield from self._to_ecs(leaves, n, tree)
        elif key == "<":
            for n in stream:
                sib: list[int] = []
                p = tree.parents[n]
                if p >= 0:
                    ch = tree.children(p)
                    i = ch.index(n)
                    if i > 0:
                        sib = [ch[i - 1]]
                yield from self._to_ecs(sib, n, tree)
        elif key == ">":
            for n in stream:
                sib = []
                p = tree.parents[n]
                if p >= 0:
                    ch = tree.children(p)
                    i = ch.index(n)
                    if i < len(ch) - 1:
                        sib = [ch[i + 1]]
                yield from self._to_ecs(sib, n, tree)
        elif key == "<<":
            for n in stream:
                p = tree.parents[n]
                if p < 0:
                    sliced: list[int] = []
                else:
                    ch = tree.children(p)
                    sliced = ch[:ch.index(n)]
                    if not rev:
                        sliced.reverse()
                yield from self._to_ecs(sliced, n, tree)
        elif key == ">>":
            for n in stream:
                p = tree.parents[n]
                if p < 0:
                    sliced = []
                else:
                    ch = tree.children(p)
                    sliced = ch[ch.index(n) + 1:]
                    if rev:
                        sliced.reverse()
                yield from self._to_ecs(sliced, n, tree)
        elif key == "<<<":
            n = None
            for n in stream:
                if tree.parents[n] < 0:
                    yield from self._to_ecs([], n, tree)
                    return
            if n is None:
                return
            root = tree.root_of(n)
            if rev:
                it: Iterable[int] = _takewhile_not(tree.walk_descendants(root, False), n)
            else:
                it = _after(tree.walk_descendants(root, True), n)
            anc_keys = {tree.key(a) for a in tree.ancestors(n)}
            it = (j for j in it if tree.key(j) not in anc_keys)
            yield from self._to_ecs(it, n, tree)
        elif key == ">>>":
            n = None
            for n in stream:
                if tree.parents[n] < 0:
                    yield from self._to_ecs([], n, tree)
                    return
            if n is None:
                return
            root = tree.root_of(n)
            stop = tree.stops[n]
            if rev:
                walk = tree.walk_descendants(root, True)
                it = _takewhile(walk, lambda j: tree.starts[j] >= stop)
            else:
                walk = tree.walk_descendants(root, False)
                it = _dropwhile(walk, lambda j: tree.starts[j] < stop)
            yield from self._to_ecs(it, n, tree)
        else:
            raise ValueError(f"invalid axis key '{self.key}'")

    def find_all(self, tree: TreeView, stream: Iterable[int],
                 values: dict | None, predicates: dict | None) -> Iterable[int]:
        for e, n in self._axis(tree, stream):
            if self.filt is not None and not self.filt(e, n, tree, values, predicates):
                continue
            if self.subq is not None and not self.subq(e, n, tree, values, predicates):
                continue
            yield n


def _takewhile_not(it: Iterable[int], sentinel: int) -> Iterable[int]:
    for j in it:
        if j == sentinel:
            return
        yield j


def _after(it: Iterable[int], sentinel: int) -> Iterable[int]:
    hit = False
    for j in it:
        if hit:
            yield j
        elif j == sentinel:
            hit = True


def _takewhile(it, pred):
    for j in it:
        if not pred(j):
            return
        yield j


def _dropwhile(it, pred):
    dropping = True
    for j in it:
        if dropping and pred(j):
            continue
        dropping = False
        yield j


# ---------------------------------------------------------------------------
# query
# ---------------------------------------------------------------------------

def _split_phrases(path: str) -> Iterable[str]:
    """Split on unescaped '/' outside subquery braces
    (reference ``Query._split_phrases``, ``_query.py:602-629``)."""
    buf: list[str] = []
    esc = False
    depth = 0
    for c in path:
        if esc:
            buf.append("\\" + c)
            esc = False
        elif c == "\\":
            esc = True
        elif c == "{":
            depth += 1
            buf.append(c)
        elif c == "}":
            depth -= 1
            buf.append(c)
        elif c == "/" and depth == 0:
            yield "".join(buf)
            buf = []
        else:
            buf.append(c)
    if esc:
        raise ValueError(f"found escape with no succeeding character in '{path}'")
    yield "".join(buf)


class Query:
    """Compiled query; compile once per worker, evaluate per row."""

    def __init__(self, path: str):
        if not path or not path.isprintable():
            raise ValueError("path must be a non-empty printable string")
        self.phrases = [_Phrase(p) for p in _split_phrases(path)]

    def find_all(self, tree: TreeView, start: int = 0,
                 values: dict | None = None,
                 predicates: dict | None = None) -> Iterable[int]:
        cur: Iterable[int] = [start]
        for phrase in self.phrases:
            cur = phrase.find_all(tree, cur, values, predicates)
        yield from cur

    def find(self, tree: TreeView, start: int = 0,
             values: dict | None = None,
             predicates: dict | None = None) -> int | None:
        return next(iter(self.find_all(tree, start, values, predicates)), None)


def compile(path: str) -> Query:  # noqa: A001 - mirrors reference API name
    return Query(path)


def find_all(path: str, tree: TreeView, start: int = 0, **kw) -> Iterable[int]:
    yield from Query(path).find_all(tree, start, **kw)
