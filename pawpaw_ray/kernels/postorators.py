"""Ordered-stream consolidators — the reference's postorators as span
kernels.

Re-express ``StackedReduce`` (``/root/reference/pawpaw/arborform/
postorator/stacked_reduce.py:33-49``) and ``WindowedJoin``
(``windowed_join.py:37-47``) over ``(start, stop, desc)`` tuples instead of
Ito objects.  Within a row these run inside batch UDFs (a turn's extraction
results are an ordered in-memory stream); the cross-turn analog of
WindowedJoin is the coreference window in stages/coref.py.
"""

from __future__ import annotations

from typing import Callable, Iterable

Span3 = tuple[int, int, str | None]


def join_spans(spans: list[Span3], desc: str | None = None) -> Span3:
    """Covering span (min start .. max stop) — ``Ito.join`` semantics
    (``/root/reference/pawpaw/ito.py:766-801``)."""
    return (min(s[0] for s in spans), max(s[1] for s in spans), desc)


def stacked_reduce(
    spans: Iterable[Span3],
    reduce_func: Callable[[list[Span3]], Span3],
    push_predicate: Callable[[list[Span3], Span3], bool],
    pop_predicate: Callable[[list[Span3], Span3], bool] | None = None,
) -> Iterable[Span3]:
    """Stack-based run-length consolidation, exactly the reference's flow:
    pop-check first (emit reduced stack, clear), else accumulate; a fresh
    item either starts a new stack (push_predicate) or passes through;
    a non-empty stack at end of stream is reduced and emitted."""
    stack: list[Span3] = []
    for s in spans:
        if stack:
            if pop_predicate is not None and pop_predicate(stack, s):
                yield reduce_func(stack)
                stack.clear()
            else:
                stack.append(s)
        if not stack:
            if push_predicate(stack, s):
                stack.append(s)
            else:
                yield s
    if stack:
        yield reduce_func(stack)


def windowed_join(
    spans: Iterable[Span3],
    window_size: int,
    predicate: Callable[[list[Span3]], bool],
    desc: str | None = None,
) -> Iterable[Span3]:
    """Sliding window of N items: when full, either join the whole window
    into one covering span (predicate passes) or emit the oldest item;
    stream tail is flushed unjoined."""
    if window_size < 2:
        raise ValueError("window_size must be >= 2")
    window: list[Span3] = []
    for s in spans:
        window.append(s)
        if len(window) == window_size:
            if predicate(window):
                yield join_spans(window, desc)
                window.clear()
            else:
                yield window.pop(0)
    yield from window
