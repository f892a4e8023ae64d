"""Differential tests: span postorator kernels vs the reference's
StackedReduce / WindowedJoin on identical streams."""

import pytest

from pawpaw_ray.kernels.postorators import join_spans, stacked_reduce, windowed_join

TEXT = "aa bb cc dd ee ff gg hh ii jj"
# word spans of TEXT
WORDS = [(i * 3, i * 3 + 2) for i in range(10)]


def _ref_stream(pp, spans, descs=None):
    descs = descs or [None] * len(spans)
    return [pp.Ito(TEXT, s, e, d) for (s, e), d in zip(spans, descs)]


@pytest.mark.parametrize("gap", [1, 2])
def test_stacked_reduce_parity(pawpaw_ref, gap):
    """Consolidate adjacent spans (gap <= `gap`) into one covering span."""
    pp = pawpaw_ref
    from pawpaw.arborform import StackedReduce

    spans = [WORDS[0], WORDS[1], WORDS[3], WORDS[4], WORDS[8]]

    ref_reduce = lambda stack: pp.Ito.join(*stack, desc="run")
    ref_push = lambda stack, ito: True
    ref_pop = lambda stack, ito: ito.start - stack[-1].stop > gap
    theirs = [(i.start, i.stop, i.desc)
              for i in StackedReduce(ref_reduce, ref_push, ref_pop)(
                  _ref_stream(pp, spans))]

    ours = list(stacked_reduce(
        [(s, e, None) for s, e in spans],
        reduce_func=lambda stack: join_spans(stack, "run"),
        push_predicate=lambda stack, s: True,
        pop_predicate=lambda stack, s: s[0] - stack[-1][1] > gap))
    assert ours == theirs


def test_stacked_reduce_passthrough_parity(pawpaw_ref):
    """push_predicate=False items flow through unreduced."""
    pp = pawpaw_ref
    from pawpaw.arborform import StackedReduce

    spans = WORDS[:6]
    is_even = lambda s: (s[0] // 3) % 2 == 0

    theirs = [(i.start, i.stop, i.desc)
              for i in StackedReduce(
                  lambda st: pp.Ito.join(*st, desc="r"),
                  lambda st, ito: (ito.start // 3) % 2 == 0,
                  lambda st, ito: not is_even((ito.start, ito.stop)))(
                  _ref_stream(pp, spans))]
    ours = list(stacked_reduce(
        [(s, e, None) for s, e in spans],
        reduce_func=lambda st: join_spans(st, "r"),
        push_predicate=lambda st, s: is_even(s),
        pop_predicate=lambda st, s: not is_even(s)))
    assert ours == theirs and ours


@pytest.mark.parametrize("wsize", [2, 3])
def test_windowed_join_parity(pawpaw_ref, wsize):
    pp = pawpaw_ref
    from pawpaw.arborform import WindowedJoin

    spans = WORDS[:7]
    # join windows whose total covered width is even
    ref_pred = lambda w: (w[-1].stop - w[0].start) % 2 == 0
    theirs = [(i.start, i.stop, i.desc)
              for i in WindowedJoin(wsize, ref_pred, desc="j")(
                  _ref_stream(pp, spans))]

    ours = list(windowed_join(
        [(s, e, None) for s, e in spans], wsize,
        lambda w: (w[-1][1] - w[0][0]) % 2 == 0, desc="j"))
    assert ours == theirs and ours


def test_windowed_join_validates():
    with pytest.raises(ValueError):
        list(windowed_join([], 1, lambda w: True))
