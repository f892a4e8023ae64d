"""Segmentation stage: transcript turns → flat span-tree column.

A stateless ``map_batches`` transform (``batch_format="pyarrow"``): for each
row's ``text`` it runs the SimpleNlp-shaped cascade
(paragraph → sentence → word|number, ``pawpaw_ray.kernels.nlp.segment_text``)
and appends a ``spans`` column of type
``list<struct{start:int32, stop:int32, desc:int8, parent:int32}>`` —
the flat-preorder encoding of the reference's Ito tree
(``/root/reference/pawpaw/ito.py`` tree invariants; see SURVEY.md §1.5).

The per-row work is regex matching windowed by ``pos``/``endpos`` over the
row's own text (never substring slicing); patterns are compiled once per
worker process at module import.  The batch-level assembly is a single
vectorized ``ListArray.from_arrays`` construction — no per-row Arrow calls.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pawpaw_ray.kernels.nlp import DESC_VOCAB, segment_text

SPAN_STRUCT = pa.struct([
    ("start", pa.int32()),
    ("stop", pa.int32()),
    ("desc", pa.int8()),
    ("parent", pa.int32()),
])
SPANS_TYPE = pa.list_(SPAN_STRUCT)


def _finish_lists(all_starts, all_stops, all_descs, all_parents, offsets):
    struct = pa.StructArray.from_arrays(
        [
            pa.array(np.asarray(all_starts, dtype=np.int32), pa.int32()),
            pa.array(np.asarray(all_stops, dtype=np.int32), pa.int32()),
            pa.array(np.asarray(all_descs, dtype=np.int8), pa.int8()),
            pa.array(np.asarray(all_parents, dtype=np.int32), pa.int32()),
        ],
        fields=list(SPAN_STRUCT),
    )
    return pa.ListArray.from_arrays(
        pa.array(np.asarray(offsets, dtype=np.int32), pa.int32()), struct)


def spans_column(texts) -> tuple[pa.ListArray, list[bool]]:
    """Build the spans list column for an iterable of text values.

    Returns ``(list_array, quarantined)``: a row whose regex work exceeds
    the guard budget (``kernels/guard.py``) is emitted as a root-only
    ``Document`` span and flagged True — the stage completes instead of
    hanging a task on one pathological document.
    """
    from pawpaw_ray.kernels.nlp import D_DOC

    all_starts: list[int] = []
    all_stops: list[int] = []
    all_descs: list[int] = []
    all_parents: list[int] = []
    offsets = [0]
    quarantined: list[bool] = []
    for t in texts:
        bad = False
        if t:
            try:
                s, e, d, p = segment_text(t)
            except TimeoutError:
                bad = True
                s, e, d, p = [0], [len(t)], [D_DOC], [-1]
            all_starts.extend(s)
            all_stops.extend(e)
            all_descs.extend(d)
            all_parents.extend(p)
        offsets.append(len(all_starts))
        quarantined.append(bad)
    return (_finish_lists(all_starts, all_stops, all_descs, all_parents,
                          offsets), quarantined)


def segment_batch(batch: pa.Table, text_col: str = "text",
                  quarantine_col: str | None = "span_quarantined") -> pa.Table:
    """map_batches UDF: append the ``spans`` tree column (plus the
    timed-out-row flag unless ``quarantine_col`` is None)."""
    texts = batch[text_col].to_pylist()
    col, quar = spans_column(texts)
    batch = batch.append_column("spans", col)
    if quarantine_col:
        batch = batch.append_column(quarantine_col, pa.array(quar, pa.bool_()))
    return batch


def sentences_column(texts) -> tuple[pa.ListArray, list[bool]]:
    """Sentence-level spans column: Document → paragraph → sentence only.

    The KG path (SVO extraction) consumes only sentence spans, so skipping
    word/number nodes cuts the segmentation regex work ~3.4x at identical
    downstream results.  Same Arrow schema and (list_array, quarantined)
    contract as :func:`spans_column`.
    """
    from pawpaw_ray.kernels.nlp import (
        D_DOC, D_PARA, D_SENT, PARAGRAPH_RE, SENTENCE_RE)
    from pawpaw_ray.kernels.spans import split_spans

    all_starts: list[int] = []
    all_stops: list[int] = []
    all_descs: list[int] = []
    all_parents: list[int] = []
    offsets = [0]
    quarantined: list[bool] = []
    for t in texts:
        bad = False
        if t:
            base = len(all_starts)
            all_starts.append(0); all_stops.append(len(t))
            all_descs.append(D_DOC); all_parents.append(-1)
            try:
                for p_span in split_spans(t, (0, len(t)), PARAGRAPH_RE, trusted=True):
                    p_idx = len(all_starts) - base
                    all_starts.append(p_span[0]); all_stops.append(p_span[1])
                    all_descs.append(D_PARA); all_parents.append(0)
                    for s_span in split_spans(t, p_span, SENTENCE_RE, trusted=True):
                        all_starts.append(s_span[0]); all_stops.append(s_span[1])
                        all_descs.append(D_SENT); all_parents.append(p_idx)
            except TimeoutError:
                # roll back to the root-only tree and flag the row
                bad = True
                del all_starts[base + 1:], all_stops[base + 1:]
                del all_descs[base + 1:], all_parents[base + 1:]
        offsets.append(len(all_starts))
        quarantined.append(bad)
    return (_finish_lists(all_starts, all_stops, all_descs, all_parents,
                          offsets), quarantined)


def segment_sentences_batch(batch: pa.Table, text_col: str = "text",
                            quarantine_col: str | None = "span_quarantined",
                            ) -> pa.Table:
    """map_batches UDF: sentence-level ``spans`` column (KG fast path)."""
    texts = batch[text_col].to_pylist()
    col, quar = sentences_column(texts)
    batch = batch.append_column("spans", col)
    if quarantine_col:
        batch = batch.append_column(quarantine_col, pa.array(quar, pa.bool_()))
    return batch


def tree_rows(batch: pa.Table):
    """Iterate (row_index, starts, stops, descs, parents) numpy views of the
    ``spans`` column — the zero-copy read side used by downstream kernels."""
    col = batch["spans"]
    row0 = 0
    for chunk in (col.chunks if isinstance(col, pa.ChunkedArray) else [col]):
        # NOTE on sliced arrays (Ray hands out zero-copy block slices):
        # ``.offsets`` values are ABSOLUTE indices into the full child array,
        # while ``.flatten()`` REBASES the child — mixing them corrupts every
        # span in a slice.  ``.values`` is the unrebased child that pairs
        # correctly with ``.offsets``.
        offsets = chunk.offsets.to_numpy()
        flat = chunk.values
        starts = flat.field("start").to_numpy()
        stops = flat.field("stop").to_numpy()
        descs = flat.field("desc").to_numpy()
        parents = flat.field("parent").to_numpy()
        for i in range(len(chunk)):
            a, b = offsets[i], offsets[i + 1]
            yield row0 + i, starts[a:b], stops[a:b], descs[a:b], parents[a:b]
        row0 += len(chunk)


def desc_counts(batch: pa.Table) -> pa.Table:
    """Per-turn node counts per desc label (debug/metrics helper)."""
    out = {f"n_{d.lower()}": [] for d in DESC_VOCAB}
    for _, _, _, descs, _ in tree_rows(batch):
        c = np.bincount(descs, minlength=len(DESC_VOCAB))
        for j, d in enumerate(DESC_VOCAB):
            out[f"n_{d.lower()}"].append(int(c[j]))
    cols = {k: pa.array(v, pa.int32()) for k, v in out.items()}
    t = batch.select([c for c in ("conv_id", "turn_idx", "doc_id") if c in batch.column_names])
    for k, v in cols.items():
        t = t.append_column(k, v)
    return t
