"""Differential tests: span kernels vs the reference implementation.

Each test runs the SAME input through pawpaw (imported read-only from
/root/reference) and through our flat-array kernels and asserts identical
span structure — the safety net for the subtle nesting/split semantics
(SURVEY.md §7 'hard parts' (a)).
"""

import random

import pytest
import regex as rx

from pawpaw_ray.kernels.spans import (
    Retention,
    extract,
    gaps,
    nest_match,
    split_by_boundaries,
    split_spans,
    strip_span,
)


def flatten_ito(ito, parent_idx=-1, acc=None):
    """Preorder-flatten a pawpaw Ito tree to (start, stop, desc, parent)."""
    if acc is None:
        acc = []
    idx = len(acc)
    acc.append((ito.start, ito.stop, ito.desc, parent_idx))
    for c in ito.children:
        flatten_ito(c, idx, acc)
    return acc


NEST_PATTERNS = [
    (r"(?P<phrase>(?P<word>(?P<char>\w)+)(?:\s(?P<word>(?P<char>\w)+))*)",
     "The quick brown fox jumps"),
    (r"(?P<pair>(?P<key>\w+)=(?P<val>\w+))", "a=1 b=2 c=3"),
    (r"(?P<outer>(?P<a>x+)(?P<b>y+)?)", "xxy xx xyy"),
]


@pytest.mark.parametrize("pat,text", NEST_PATTERNS)
def test_nest_match_matches_reference(pawpaw_ref, pat, text):
    pp = pawpaw_ref
    p = rx.compile(pat, rx.DOTALL)

    ours = extract(text, (0, len(text)), p)

    # our extract defaults to the arborform Extract group filter (no group 0,
    # extract.py:16); pass the equivalent filter to the reference's from_re
    theirs = []
    for root_ito in pp.Ito.from_re(p, text, group_filter=lambda m, gk: str(gk) != "0"):
        base = len(theirs)
        for s, e, d, par in flatten_ito(root_ito):
            theirs.append((s, e, d, par if par == -1 else par + base))
    assert [(s, e, d, par) for s, e, d, par in ours] == theirs


def test_from_match_multicapture(pawpaw_ref):
    """Multi-capture groups: every capture becomes a node (ito.py:117)."""
    p = rx.compile(r"(?P<list>(?P<item>\d+)(?:,(?P<item>\d+))*)")
    text = "1,22,333"
    ours = extract(text, (0, len(text)), p)
    theirs = []
    for root in pawpaw_ref.Ito.from_re(p, text, group_filter=lambda m, gk: str(gk) != "0"):
        theirs.extend(flatten_ito(root))
    assert [(s, e, d) for s, e, d, _ in ours] == [(s, e, d) for s, e, d, _ in theirs]


SPLIT_CASES = [
    ("a,b,c", r","),
    (",leading", r","),
    ("trailing,", r","),
    ("a,,b", r","),
    ("nosep", r","),
    ("", r","),
    ("one two  three", r"\s+"),
    ("x1y22z", r"\d+"),
]


@pytest.mark.parametrize("retention", list(Retention))
@pytest.mark.parametrize("text,sep", SPLIT_CASES)
def test_split_matches_reference(pawpaw_ref, text, sep, retention):
    pp = pawpaw_ref
    pat = rx.compile(sep)
    ref_split = pp.arborform.Split(
        pat, boundary_retention=pp.arborform.Split.BoundaryRetention[retention.name])
    theirs = [(i.start, i.stop) for i in ref_split(pp.Ito(text))]
    ours = split_spans(text, (0, len(text)), pat, retention)
    assert ours == theirs


@pytest.mark.parametrize("retention", list(Retention))
def test_split_windowed_span(pawpaw_ref, retention):
    """Split of a sub-span (windowed, not whole string)."""
    pp = pawpaw_ref
    text = "xx a,b,c yy"
    pat = rx.compile(",")
    inner = pp.Ito(text, 3, 8)
    ref_split = pp.arborform.Split(
        pat, boundary_retention=pp.arborform.Split.BoundaryRetention[retention.name])
    theirs = [(i.start, i.stop) for i in ref_split(inner)]
    ours = split_spans(text, (3, 8), pat, retention)
    assert ours == theirs


def test_split_limit(pawpaw_ref):
    pp = pawpaw_ref
    text = "a,b,c,d"
    pat = rx.compile(",")
    for limit in (0, 1, 2, 10):
        ref_split = pp.arborform.Split(pat, limit=limit)
        theirs = [(i.start, i.stop) for i in ref_split(pp.Ito(text))]
        ours = split_spans(text, (0, len(text)), pat, limit=limit)
        assert ours == theirs, f"limit={limit}"


def test_gaps_matches_reference(pawpaw_ref):
    pp = pawpaw_ref
    text = "0123456789"
    rng = random.Random(7)
    for _ in range(50):
        cuts = sorted(rng.sample(range(11), rng.randint(0, 4)))
        non_gaps = []
        i = 0
        while i + 1 < len(cuts):
            non_gaps.append((cuts[i], cuts[i + 1]))
            i += 2
        theirs = [(i.start, i.stop) for i in pp.Ito.from_gaps(
            text, [pp.Span(*s) for s in non_gaps])]
        ours = gaps((0, len(text)), non_gaps)
        assert ours == theirs, f"non_gaps={non_gaps}"


def test_strip_matches_reference(pawpaw_ref):
    pp = pawpaw_ref
    for text in ["  ab  ", "\t\nx\n", "xxyxx", "   ", ""]:
        ito = pp.Ito(text)
        assert strip_span(text, (0, len(text))) == tuple(ito.str_strip().span)
        assert strip_span(text, (0, len(text)), "x") == tuple(ito.str_strip("x").span)


def test_zero_split_and_boundary_flags():
    # no boundaries → whole span back (non-boundary)
    assert split_by_boundaries((2, 5), []) == [((2, 5), False)]
    assert split_by_boundaries((2, 5), [], return_zero_split=False) == []
    # ALL mode interleaves segments and boundaries in order
    got = split_by_boundaries((0, 7), [(1, 2), (4, 5)], Retention.ALL)
    assert got == [((0, 1), False), ((1, 2), True), ((2, 4), False),
                   ((4, 5), True), ((5, 7), False)]


def test_tree_rows_on_sliced_and_chunked_batches():
    """Ray hands map UDFs zero-copy block slices; tree_rows must read spans
    identically on sliced, chunked, and contiguous tables (regression: a
    sliced ListArray's .offsets are absolute while .flatten() rebases)."""
    import pyarrow as pa

    from pawpaw_ray.stages.segment import segment_batch, tree_rows
    from pawpaw_ray.stages.triples import triples_batch

    texts = [f"Alice met Bob number {i}. They left." for i in range(50)]
    full = segment_batch(pa.table({
        "conv_id": [f"c{i}" for i in range(50)],
        "turn_idx": pa.array(range(50), pa.int32()),
        "text": texts}))

    def rows_of(tbl):
        return [(i, list(s), list(e)) for i, s, e, _, _ in tree_rows(tbl)]

    sliced = full.slice(10, 20)
    expect = rows_of(full)[10:30]
    got = rows_of(sliced)
    assert [r[1:] for r in got] == [r[1:] for r in expect]

    # chunked: two slices concatenated → row indices must stay global
    chunked = pa.concat_tables([full.slice(0, 30), full.slice(30, 20)])
    assert rows_of(chunked) == rows_of(full)

    # end-to-end: triple extraction must agree on slice vs full
    t_full = triples_batch(full).to_pandas()
    t_slice = triples_batch(sliced).to_pandas()
    t_full_sub = t_full[t_full["conv_id"].isin(t_slice["conv_id"])].reset_index(drop=True)
    assert t_slice.reset_index(drop=True).equals(t_full_sub)


def test_from_substrings_differential(pawpaw_ref):
    pp = pawpaw_ref
    from pawpaw_ray.kernels.spans import from_substrings

    text = "ababce ab ce"
    for subs in [("ab", "ce"), ("ab", "ab", "ce"), ("ab", "ab", "ce", "ab", "ce")]:
        ours = from_substrings(text, (0, len(text)), *subs)
        theirs = [i.span for i in pp.Ito.from_substrings(text, *subs)]
        assert ours == [tuple(s) for s in theirs], subs
    import pytest as _pytest
    with _pytest.raises(ValueError):
        from_substrings(text, (0, len(text)), "zzz")


def test_adopt_differential(pawpaw_ref):
    pp = pawpaw_ref
    from pawpaw_ray.kernels.spans import adopt_spans

    text = "aa bb cc dd ee"
    spans = [((3, 8), "mid"), ((3, 5), "w1"), ((6, 8), "w2"), ((12, 14), "w3")]
    ours = adopt_spans(spans, desc="root")

    itos = [pp.Ito(text, s, e, d) for (s, e), d in spans]
    root = pp.Ito.adopt(itos, desc="root")
    def flatten(i, parent=-1, acc=None, idx=None):
        if acc is None:
            acc, idx = [], [0]
        me = idx[0]
        acc.append((i.start, i.stop, i.desc, parent))
        idx[0] += 1
        for c in i.children:
            flatten(c, me, acc, idx)
        return acc
    theirs = flatten(root)
    assert sorted(ours) == sorted(theirs)
    assert ours[0] == theirs[0]  # same root


def test_invert_and_strip_to_children_differential(pawpaw_ref):
    pp = pawpaw_ref
    from pawpaw_ray.kernels.spans import invert_children, strip_to_children

    text = "  aa bb   cc "
    parent = pp.Ito(text)
    kids = [pp.Ito(text, 2, 4), pp.Ito(text, 5, 7), pp.Ito(text, 10, 12)]
    parent.children.add(*kids)

    inv = parent.invert_children(desc="gap")
    theirs = [tuple(c.span) for c in inv.children]
    ours = invert_children((0, len(text)), [(2, 4), (5, 7), (10, 12)])
    assert ours == theirs

    stc = parent.clone().strip_to_children()
    assert strip_to_children((0, len(text)), [(2, 4), (5, 7), (10, 12)]) == tuple(stc.span)


def test_to_line_col_differential(pawpaw_ref):
    pp = pawpaw_ref
    import regex as rx
    from pawpaw_ray.kernels.spans import to_line_col

    text = "ab\ncde\r\nf\n\nghi"
    for pos in range(len(text)):
        it = pp.Ito(text, pos, len(text))
        for eol in ["\n", "\r\n"]:
            assert to_line_col(text, pos, eol) == it.to_line_col(eol), (pos, eol)
        pat = rx.compile(r"\r\n|\n")
        assert to_line_col(text, pos, pat) == it.to_line_col(pat), pos
