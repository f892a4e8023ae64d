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
