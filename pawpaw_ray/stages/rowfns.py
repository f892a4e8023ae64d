"""Driver-visible grid queries for the row-local helper layers.

The ``str_`` family (kernels/strfns.py), the ``__format__`` mini-language
(kernels/fmt.py) and XmlHelper namespace resolution (kernels/xmlhelper.py)
are row-scoped function layers with no natural pipeline of their own —
round 2 covered them with differential pytest only.  These stages run a
deterministic op grid over the ``documents`` fixture as ordinary
``map_batches`` transforms so the driver's CORRECTNESS gate hash-checks
them against goldens produced by the REFERENCE implementation
(``scripts/make_golden.py``: pawpaw ``Ito.str_*`` / ``format(ito, spec)``,
stdlib-ET namespace resolution — none of this module's code runs there).

Grid constants here are the *rule definitions* both sides must agree on
(specs, subjects, document shapes); the result canonicalization
(``span → "s:e"``, no nulls) keeps the hash comparison type-stable.
"""

from __future__ import annotations

import pyarrow as pa

# --- shared rule definitions (imported by scripts/make_golden.py) ----------

# (op key, argument) — applied per (doc, span); results canonicalized below
STR_OPS = [
    ("count", "e"), ("find", "the"), ("rfind", "the"),
    ("startswith", "The"), ("endswith", "."),
    ("isalpha", None), ("isascii", None), ("isprintable", None),
    ("istitle", None), ("isupper", None), ("islower", None),
    ("isdigit", None), ("isspace", None),
    ("strip", None), ("lstrip", None), ("rstrip", None),
    ("strip", " .,eE"),
    ("partition", " "), ("rpartition", " "),
    ("split", " "), ("rsplit", " "),
    ("splitlines", None),
    ("removeprefix", "The"), ("removesuffix", "."),
]

# the __format__ spec grid (mirrors the reference-parity pytest grid)
FMT_SPECS = [
    "", "%span", "%start", "%stop", "%span:04d", "%start:+d/%stop:>6",
    "%substr", "%desc", "%string", "%value",
    "%desc of [%substr] at %span",
    "%substr!r", "%substr!a", "%substr!2r", "%substr!2r1",
    "%substr:6", "%substr:6…", "%substr:<6…", "%substr:^7--",
    "%substr:>9...", "%substr:2abcdef", "%desc:3",
    "% ", "a% b", "100%% sure %substr", "%unknown stays", "%",
    "%span %substr %desc %start %stop",
]


def span_grid(n: int) -> list[tuple[int, int]]:
    """Deterministic spans for a text of length ``n`` (full, clipped head
    window, middle third)."""
    return [(0, n), (min(2, n), min(32, n)), (n // 3, 2 * n // 3)]


def ns_doc(i: int) -> str:
    """Synthetic namespaced XML document ``i``: default ns, prefixed ns,
    prefixed + plain attributes, ``xmlns=""`` un-declaration, nested
    redeclaration — the XmlHelper semantics worth hashing."""
    return (
        f'<root xmlns="urn:d{i % 3}" xmlns:a="urn:a{i % 2}">'
        f'<a:item a:key="k{i}" plain="p{i}">x{i}</a:item>'
        f'<item xmlns="">y{i}<sub>z{i}</sub></item>'
        f'<b:leaf xmlns:b="urn:b{i % 5}" b:n="v{i}"/>'
        f'<inner xmlns="urn:e{i % 4}"><deep>w{i}</deep></inner>'
        f'</root>')


# --- canonical result encodings -------------------------------------------

def enc_span(sp) -> str:
    return f"{sp[0]}:{sp[1]}"


def enc_spans(sps) -> str:
    return ";".join(enc_span(s) for s in sps)


def _str_op_result(text: str, span, op: str, arg) -> str:
    from pawpaw_ray.kernels import strfns as sf

    if op == "count":
        return str(sf.str_count(text, span, arg))
    if op == "find":
        return str(sf.str_find(text, span, arg))
    if op == "rfind":
        return str(sf.str_rfind(text, span, arg))
    if op == "startswith":
        return str(sf.str_startswith(text, span, arg))
    if op == "endswith":
        return str(sf.str_endswith(text, span, arg))
    if op.startswith("is"):
        return str(getattr(sf, f"str_{op}")(text, span))
    if op in ("strip", "lstrip", "rstrip"):
        return enc_span(getattr(sf, f"str_{op}")(text, span, arg))
    if op in ("partition", "rpartition"):
        return enc_spans(getattr(sf, f"str_{op}")(text, span, arg))
    if op in ("split", "rsplit"):
        return enc_spans(getattr(sf, f"str_{op}")(text, span, arg, 2))
    if op == "splitlines":
        return enc_spans(sf.str_splitlines(text, span))
    if op == "removeprefix":
        return enc_span(sf.str_removeprefix(text, span, arg))
    if op == "removesuffix":
        return enc_span(sf.str_removesuffix(text, span, arg))
    raise ValueError(op)


def str_ops_batch(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    ids, case, op_keys, results = [], [], [], []
    for doc_id, text in zip(batch[id_col].to_pylist(),
                            batch[text_col].to_pylist()):
        text = text or ""
        for si, span in enumerate(span_grid(len(text))):
            for oi, (op, arg) in enumerate(STR_OPS):
                ids.append(doc_id)
                case.append(si)
                op_keys.append(f"{op}:{arg}" if arg is not None else op)
                results.append(_str_op_result(text, span, op, arg))
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "span_id": pa.array(case, pa.int32()),
        "op": pa.array(op_keys, pa.string()),
        "result": pa.array(results, pa.string()),
    })


def format_grid_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    from pawpaw_ray.kernels.fmt import format_span

    ids, case, spec_ids, rendered = [], [], [], []
    for doc_id, text in zip(batch[id_col].to_pylist(),
                            batch[text_col].to_pylist()):
        text = text or ""
        spans = [(s, e, ("tok" if si else None))
                 for si, (s, e) in enumerate(span_grid(len(text)))]
        for si, (s, e, desc) in enumerate(spans):
            for fi, spec in enumerate(FMT_SPECS):
                ids.append(doc_id)
                case.append(si)
                spec_ids.append(fi)
                rendered.append(format_span(spec, text, s, e, desc))
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "span_id": pa.array(case, pa.int32()),
        "spec_id": pa.array(spec_ids, pa.int32()),
        "rendered": pa.array(rendered, pa.string()),
    })


def xml_ns_batch(batch: pa.Table, id_col: str = "doc_id",
                 xml_col: str = "xml") -> pa.Table:
    from pawpaw_ray.kernels import xmlhelper as xh
    from pawpaw_ray.kernels.xmlspans import parse_xml_spans

    ids, ords, tags, attrs, heads = [], [], [], [], []
    for doc_id, doc in zip(batch[id_col].to_pylist(),
                           batch[xml_col].to_pylist()):
        nodes = parse_xml_spans(doc, ignore_empties=False)
        for el_ord, idx in enumerate(xh.element_indices(nodes)):
            ids.append(doc_id)
            ords.append(el_ord)
            tags.append(xh.resolve_tag(doc, nodes, idx))
            a = xh.resolve_attributes(doc, nodes, idx)
            attrs.append(";".join(f"{k}={v}" for k, v in sorted(a.items())))
            h = xh.element_head_text(doc, nodes, idx)
            heads.append("None" if h is None else h)
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "el_ord": pa.array(ords, pa.int32()),
        "tag": pa.array(tags, pa.string()),
        "attrs": pa.array(attrs, pa.string()),
        "head_text": pa.array(heads, pa.string()),
    })


# --- connector-DAG flow grid (kernels/arborform.py vs reference arborform) --
# Reference flow semantics under test: ``/root/reference/pawpaw/arborform/
# itorator/itorator.py:130-173`` (connector dispatch) and ``ito.py:
# 1532-1615`` (ChildItos.add / add_hierarchical adoption).

# Shared RULE definitions: the pipeline shape both engines must agree on.
# The flow exercises every connector semantic observably: RECURSE (paragraph
# → sentence outputs continue through the remaining chain), SUBROUTINE with
# a callable predicate (short sentences get desc "short" by side effect),
# CHILDREN.ADD (tokens under every sentence), DELEGATE with a desc
# predicate (short sentences exit the chain here — they must NOT receive
# cap children), and CHILDREN.ADD_HIERARCHICAL (capitalized runs adopt the
# token children they cover).  The cap pattern is \b-anchored on both ends
# so cap spans always cover COMPLETE tokens (never a partial overlap, which
# would raise in both engines).
FLOW_PARA_RE = r"\n{2,}"
FLOW_SENT_RE = r"(?<=[.!?])\s+"
FLOW_TOK_RE = r"(?P<tok>[A-Za-z0-9_]+)"
FLOW_CAP_RE = r"\b(?P<cap>[A-Z][a-z]+(?: [A-Z][a-z]+)+)\b"
FLOW_SHORT_LEN = 40

FLOW_SPEC = {
    "itor": "split", "re": FLOW_PARA_RE, "retention": "none", "desc": "para",
    "connections": [
        {"connector": "recurse",
         "itor": {"itor": "split", "re": FLOW_SENT_RE, "retention": "none",
                  "desc": "sent"}},
        {"connector": "subroutine",
         "predicate": {"fn": "flow_is_short"},
         "itor": {"itor": "desc", "desc": "short"}},
        {"connector": "children_add",
         "itor": {"itor": "extract", "re": FLOW_TOK_RE}},
        {"connector": "delegate", "predicate": "short",
         "itor": {"itor": "reflect"}},
        {"connector": "children_add_hierarchical",
         "itor": {"itor": "extract", "re": FLOW_CAP_RE}},
    ],
}


def _register_flow_predicates() -> None:
    from pawpaw_ray.kernels.arborform import register_predicate

    register_predicate(
        "flow_is_short",
        lambda node, text: node.stop - node.start < FLOW_SHORT_LEN)


_register_flow_predicates()


def arborform_flow_batch(batch: pa.Table, text_col: str = "text",
                         id_col: str = "doc_id") -> pa.Table:
    from pawpaw_ray.kernels.arborform import (build_itor, flatten_tree,
                                              run_pipeline)

    itor = build_itor(FLOW_SPEC)
    ids, ords, starts, stops, descs, parents = [], [], [], [], [], []
    for doc_id, text in zip(batch[id_col].to_pylist(),
                            batch[text_col].to_pylist()):
        if not text:
            continue
        root = run_pipeline(text, itor, root_desc="Document")
        s, e, d, p = flatten_tree([root])
        for i in range(len(s)):
            ids.append(doc_id)
            ords.append(i)
            starts.append(s[i])
            stops.append(e[i])
            descs.append("None" if d[i] is None else d[i])
            parents.append(p[i])
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "node_ord": pa.array(ords, pa.int32()),
        "start": pa.array(starts, pa.int32()),
        "stop": pa.array(stops, pa.int32()),
        "desc": pa.array(descs, pa.string()),
        "parent": pa.array(parents, pa.int32()),
    })


# --- postorator grid (kernels/postorators.py vs reference postorators) -----
# Reference semantics under test: ``/root/reference/pawpaw/arborform/
# postorator/stacked_reduce.py:33-49`` and ``windowed_join.py:37-47``.

# Shared RULE definitions: three postorator configurations over the word
# stream of each document.  Predicates are pure span arithmetic so both
# engines express the identical rule:
#   wj2 — WindowedJoin(2): join when the covering span is <= 12 chars
#   wj3 — WindowedJoin(3): join when every member is <= 4 chars
#   sr  — StackedReduce: push words <= 3 chars, pop on words > 5 chars,
#         reduce = covering span with desc "run"
POST_WJ2_COVER = 12
POST_WJ3_EACH = 4
POST_SR_PUSH = 3
POST_SR_POP = 5


def postorator_grid_batch(batch: pa.Table, text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    import regex as rx

    from pawpaw_ray.kernels.postorators import (join_spans, stacked_reduce,
                                                windowed_join)

    tok_rx = rx.compile(r"[A-Za-z0-9_]+")

    def configs(words):
        yield "wj2", windowed_join(
            words, 2,
            lambda w: (max(x[1] for x in w) - min(x[0] for x in w)
                       <= POST_WJ2_COVER),
            "pair")
        yield "wj3", windowed_join(
            words, 3,
            lambda w: all(x[1] - x[0] <= POST_WJ3_EACH for x in w),
            "triple")
        yield "sr", stacked_reduce(
            words,
            lambda stack: join_spans(stack, "run"),
            lambda stack, s: s[1] - s[0] <= POST_SR_PUSH,
            lambda stack, s: s[1] - s[0] > POST_SR_POP)

    ids, cfgs, ords, starts, stops, descs = [], [], [], [], [], []
    for doc_id, text in zip(batch[id_col].to_pylist(),
                            batch[text_col].to_pylist()):
        words = [(m.start(), m.end(), "word")
                 for m in tok_rx.finditer(text or "")]
        for cfg, stream in configs(list(words)):
            for i, (s, e, d) in enumerate(stream):
                ids.append(doc_id)
                cfgs.append(cfg)
                ords.append(i)
                starts.append(s)
                stops.append(e)
                descs.append("None" if d is None else d)
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "cfg": pa.array(cfgs, pa.string()),
        "out_ord": pa.array(ords, pa.int32()),
        "start": pa.array(starts, pa.int32()),
        "stop": pa.array(stops, pa.int32()),
        "desc": pa.array(descs, pa.string()),
    })


# --- escape-aware util grid (kernels/strutil.py vs reference pawpaw.util) ---

ESC_N_CASES = 8


def esc_subject(i: int, case: int) -> str:
    """Deterministic escape/balance subject ``case`` for row ``i``: plain
    separators, escaped separators, doubled escapes, nested/sibling braces,
    lchar==rchar delimiters, a trailing DOUBLED escape (valid), a trailing
    single escape (ValueError parity), and an unbalanced brace (ditto)."""
    w = f"w{i}"
    return [
        f"{w} plain, text. with, seps.",
        rf"{w} escaped\, comma \\ and \. dot,end",
        rf"\\{w}\\\\,mid\,tail,{i}",
        f"{{{w} {{inner{i}}} tail}} {{b{i}}} (par(en{i})s) [sq,{i}]",
        f"|{w}|mid|{i}|",
        rf"{w} trailing doubled escape ok \\",
        f"{w} bad trailing" + "\\",
        f"{w} {{open{i} never closed",
    ][case]


# (op key, args) — results JSON-encoded; ValueError parity captured as ERR
ESC_OPS = [
    ("escapes", None),
    ("unescaped", ",."),
    ("unescaped", "|"),
    ("split", ","),
    ("balanced", "{}"),
    ("balanced", "()"),
    ("balanced", "[]"),
    ("balanced", "||"),
]


def _esc_op_result(s: str, op: str, arg) -> str:
    import json

    from pawpaw_ray.kernels import strutil as su

    try:
        if op == "escapes":
            return json.dumps(list(su.find_escapes(s)))
        if op == "unescaped":
            return json.dumps(list(su.find_unescaped(s, arg)))
        if op == "split":
            return json.dumps(list(su.split_unescaped(s, arg)))
        if op == "balanced":
            return json.dumps(list(su.find_balanced(s, arg[0], arg[1])))
        raise KeyError(op)
    except ValueError:
        # messages differ cosmetically between the implementations ("found
        # at index" vs "at index") — the TYPE raised is the contract
        return "ERR:ValueError"


def esc_ops_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    ids, cases, op_keys, results = [], [], [], []
    for i, case in zip(batch[id_col].to_pylist(),
                       batch["case"].to_pylist()):
        s = esc_subject(i, case)
        for op, arg in ESC_OPS:
            ids.append(i)
            cases.append(case)
            op_keys.append(f"{op}:{arg}" if arg is not None else op)
            results.append(_esc_op_result(s, op, arg))
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "case": pa.array(cases, pa.int32()),
        "op": pa.array(op_keys, pa.string()),
        "result": pa.array(results, pa.string()),
    })
