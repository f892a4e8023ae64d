"""Differential tests: our plumule-compatible query engine vs the reference
engine (`pawpaw.query`) evaluated on IDENTICAL trees.

Trees are built by our segmentation kernel (`segment_text`), then mirrored
into a pawpaw Ito tree node-for-node; every query below runs through both
engines and must select the same (start, stop, desc) sequences in the same
order.
"""

import pytest

from pawpaw_ray.kernels.nlp import DESC_VOCAB, segment_text
from pawpaw_ray.kernels.query import Query, TreeView

TEXTS = [
    "Mary spake. Then John went home.\n\nHe said 1,234.56 twice. What else?\n\n"
    "Dr. Smith met Capt. Jones at 3.5 p.m. They left together.",
    "The quick brown fox jumps over the lazy dog. It runs fast!\n\n"
    "Numbers like 42 and -1.5e3 and 6.022 x 10^23 appear here. The end.",
    "One.\n\nTwo sentences here. Plus a third one now.",
]

QUERIES = [
    # axes
    "*",
    "**",
    "***",
    "*/*",
    "**[d:sentence]",
    "**[d:word]",
    "**[d:number]",
    "-**[d:word]",
    "**[d:sentence]/*",
    "**[d:word]/..",
    "**[d:word]/...",
    "**[d:word]/....",
    "**[d:word]/-...",
    "**[d:number]/..!",
    "**[d:sentence]/*![d:number]",
    "**[d:sentence]/*!![d:word]",
    "**[d:word]/.",
    "**/><",
    "**[d:word]/><",
    "**[d:sentence]/*/<",
    "**[d:sentence]/*/>",
    "**[d:word]/<<",
    "**[d:word]/>>",
    "**[d:word]/-<<",
    "**[d:word]/->>",
    # index filters
    "**[d:word] & [i:0]",
    "**[d:sentence]/*[i:0-2]",
    "**[d:sentence]/*[i:1,3]",
    "**[d:sentence]/*[~i:0-1]",
    # string filters
    "**[s:John]",
    "**[lcs:john,mary]",
    "**[scfsw:th]",
    "**[scfew:es]",
    "**[ssw:Th]",
    "**[sew:es]",
    "**[~s:John]",
    # boolean combining
    "**[d:word] & [lcs:the]",
    "**[d:word] & ~[lcs:the]",
    "**[d:word] & [lcs:the] | [lcs:fox]",
    "**[d:sentence]/*([d:word] & [lcs:the]) | [d:number]",
    "**[d:word] & [lcs:the] ^ [ssw:T]",
    # subqueries
    "**[d:sentence]{*[d:number]}",
    "**[d:sentence]{**[d:word] & [lcs:he,it]}",
    "**[d:paragraph]{**[d:number]}/**[d:word]",
    "**[d:sentence]~{*[d:number]}",
    # chained
    "**[d:paragraph]/*[d:sentence]/*[d:word] & [i:0-3]",
]

# preceding/following axes: the reference processes only the last node of
# the input stream (quirk, _query.py:192-208,254-266) — covered with
# single-node streams where semantics are well-defined
QUIRK_QUERIES = [
    "**[d:word] & [i:5]/<<<",
    "**[d:word] & [i:5]/>>>",
    "**[d:word] & [i:5]/-<<<",
    "**[d:word] & [i:5]/->>>",
    "**[s:fox]/<<<[d:word]",
    "**[s:fox]/>>>[d:word]",
]


def _mirror_tree(pp, text, starts, stops, descs, parents):
    """Rebuild the flat tree as a pawpaw Ito tree, node for node."""
    itos = [pp.Ito(text, s, e, DESC_VOCAB[d])
            for s, e, d in zip(starts, stops, descs)]
    for i, p in enumerate(parents):
        if p >= 0:
            itos[p].children.add(itos[i])
    return itos[0]


def _ours(tree: TreeView, q: str):
    return [(tree.starts[n], tree.stops[n], tree.descs[n])
            for n in Query(q).find_all(tree)]


def _theirs(pp, root, q: str):
    return [(i.start, i.stop, i.desc) for i in pp.query.find_all(q, root)]


@pytest.mark.parametrize("qs", [QUERIES, QUIRK_QUERIES])
def test_query_parity(pawpaw_ref, qs):
    pp = pawpaw_ref
    n_nonempty = 0
    for text in TEXTS:
        starts, stops, descs, parents = segment_text(text)
        tree = TreeView.from_ids(text, starts, stops, descs, parents, DESC_VOCAB)
        root = _mirror_tree(pp, text, starts, stops, descs, parents)
        for q in qs:
            ours = _ours(tree, q)
            try:
                theirs = _theirs(pp, root, q)
            except UnboundLocalError:
                # reference crashes on an empty stream into <<< / >>>
                # (_query.py:198,260 use the loop var after the loop);
                # we return empty instead
                theirs = []
            assert ours == theirs, f"query {q!r} diverged on {text[:30]!r}"
            n_nonempty += bool(ours)
    assert n_nonempty > len(qs)  # the grid must actually select things


def test_query_values_predicates(pawpaw_ref):
    pp = pawpaw_ref
    text = TEXTS[0]
    starts, stops, descs, parents = segment_text(text)
    tree = TreeView.from_ids(text, starts, stops, descs, parents, DESC_VOCAB)
    root = _mirror_tree(pp, text, starts, stops, descs, parents)

    q = "**[d:word] & [p:cap]"
    preds_ref = {"cap": lambda ec: str(ec.ito)[:1].isupper()}
    preds_ours = {"cap": lambda ec: ec[2].substr(ec[1])[:1].isupper()}
    ours = [(tree.starts[n], tree.stops[n])
            for n in Query(q).find_all(tree, predicates=preds_ours)]
    theirs = [(i.start, i.stop)
              for i in pp.query.find_all(q, root, predicates=preds_ref)]
    assert ours == theirs and ours

    q = "**[v:x]"
    vals = {"x": "John"}
    ours = [(tree.starts[n], tree.stops[n])
            for n in Query(q).find_all(tree, values=vals)]
    theirs = [(i.start, i.stop)
              for i in pp.query.find_all(q, root, values=vals)]
    assert ours == theirs and ours


def test_query_compile_errors():
    for bad in ["", "**[unknown:x]", "**[d:a", "**[d:a] &", "(**)"]:
        with pytest.raises(ValueError):
            list(Query(bad).find_all(
                TreeView("ab", [0], [2], ["Document"], [-1])))


def test_strutil_differential(pawpaw_ref):
    pp = pawpaw_ref
    from pawpaw_ray.kernels import strutil

    cases = [r"a\,b,c", r"x\\,y", r"plain", r"a,,b", r"\\\\", r"a\[b\]c"]
    for s in cases:
        from pawpaw import util as pp_util
        assert list(strutil.find_escapes(s)) == list(pp_util.find_escapes(s))
        assert list(strutil.find_unescaped(s, ",")) == list(pp.find_unescaped(s, ","))
        assert list(strutil.split_unescaped(s, ",")) == [
            str(x) for x in pp.split_unescaped(s, ",")]

    bal = ["(a(b)c)", "(a)(b)", r"x(a\)b)y", "((()))"]
    for s in bal:
        assert list(strutil.find_balanced(s, "(", ")")) == [
            str(x) for x in pp.find_balanced(s, "(", ")")]
