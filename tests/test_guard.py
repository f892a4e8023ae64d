"""Runaway-regex guard: a pathological document completes and is flagged
instead of hanging the task (kernels/guard.py, stages/segment.py)."""

import time

import pyarrow as pa
import pytest
import regex as rx

from pawpaw_ray.kernels import guard
from pawpaw_ray.kernels.spans import split_spans
from pawpaw_ray.stages.segment import segment_batch, segment_sentences_batch

# genuinely backtracks in this regex build: verified to run >0.5 s on
# "x"*3000 and be interrupted mid-call by timeout=
EVIL = rx.compile(r"(x+x+)+y")


def test_split_spans_interrupts_backtracking(monkeypatch):
    # user-supplied (untrusted) patterns get the hard per-call bound
    monkeypatch.setattr(guard, "REGEX_TIMEOUT", 0.2)
    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        split_spans("x" * 3000, (0, 3000), EVIL)
    assert time.monotonic() - t0 < 2.0  # interrupted, not run to completion


@pytest.mark.parametrize("stage", [segment_batch, segment_sentences_batch])
def test_segment_quarantines_timed_out_row(monkeypatch, stage):
    # a sub-measurable budget makes every non-trivial row trip the guard —
    # exercising the quarantine plumbing without a hand-tuned evil input
    monkeypatch.setattr(guard, "TRUSTED_TIMEOUT", 1e-9)
    texts = ["A long enough sentence to require regex work. " * 50, ""]
    batch = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(texts, pa.string())})
    out = stage(batch)
    assert out["span_quarantined"].to_pylist() == [True, False]
    spans = out["spans"].to_pylist()
    # quarantined row degrades to the root-only Document span
    assert len(spans[0]) == 1
    assert (spans[0][0]["start"], spans[0][0]["stop"]) == (0, len(texts[0]))
    assert spans[1] == []


@pytest.mark.parametrize("stage", [segment_batch, segment_sentences_batch])
def test_guard_default_budget_flags_nothing(stage):
    texts = ["Dr. Ada wrote code. It worked!", None, "Second doc here."]
    batch = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                      "text": pa.array(texts, pa.string())})
    out = stage(batch)
    assert out["span_quarantined"].to_pylist() == [False, False, False]
    assert len(out["spans"].to_pylist()[0]) > 1


def test_trusted_tier_unguarded_by_default():
    # built-ins run with timeout=None (regex C fast loop) unless opted in
    assert guard.TRUSTED_TIMEOUT is None
    assert guard.REGEX_TIMEOUT == 10.0
