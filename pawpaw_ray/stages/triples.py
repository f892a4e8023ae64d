"""Triple-extraction stage: segmented turns → candidate triple rows.

Stateless ``map_batches`` transform consuming the ``spans`` tree column
produced by :mod:`pawpaw_ray.stages.segment` and emitting one row per
candidate ``(subj, pred, obj)`` with absolute character spans and provenance
``(conv_id, turn_idx)`` — the ``triples`` schema of FIXTURES.md §4.

Rows-out ≠ rows-in (a flat-map): the UDF returns a brand-new Arrow table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pawpaw_ray.kernels.nlp import D_SENT
from pawpaw_ray.kernels.triples import extract_triples
from pawpaw_ray.stages.segment import tree_rows

TRIPLE_FIELDS = [
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("s_start", pa.int32()), ("s_stop", pa.int32()),
    ("p_start", pa.int32()), ("p_stop", pa.int32()),
    ("o_start", pa.int32()), ("o_stop", pa.int32()),
    ("subj_is_pronoun", pa.bool_()),
]
TRIPLE_SCHEMA = pa.schema(TRIPLE_FIELDS)


def triples_batch(batch: pa.Table) -> pa.Table:
    """map_batches UDF: (text, spans, conv_id, turn_idx) → triple rows.

    Hot path: appends directly to column lists (no per-triple dict) — the
    dict-based :func:`extract_triples` kernel remains the shared rule
    definition for the reference-parity harness."""
    from pawpaw_ray.kernels.triples import SUBJECT_PRONOUNS, SVO_RE

    texts = batch["text"].to_pylist()
    conv = batch["conv_id"].to_pylist()
    tidx = batch["turn_idx"].to_numpy()

    c_conv: list = []
    c_tidx: list = []
    out = {k: [] for k in ("subj", "pred", "obj", "s_start", "s_stop",
                           "p_start", "p_stop", "o_start", "o_stop",
                           "subj_is_pronoun")}
    for i, starts, stops, descs, _parents in tree_rows(batch):
        sent_mask = descs == D_SENT
        if not sent_mask.any():
            continue
        text = texts[i]
        cv, ti = conv[i], int(tidx[i])
        for s, e in zip(starts[sent_mask], stops[sent_mask]):
            m = SVO_RE.fullmatch(text, pos=s, endpos=e)
            if m is None:
                continue
            subj = m.group("subj")
            c_conv.append(cv)
            c_tidx.append(ti)
            out["subj"].append(subj)
            out["pred"].append(m.group("pred"))
            out["obj"].append(m.group("obj"))
            out["s_start"].append(m.start("subj"))
            out["s_stop"].append(m.end("subj"))
            out["p_start"].append(m.start("pred"))
            out["p_stop"].append(m.end("pred"))
            out["o_start"].append(m.start("obj"))
            out["o_stop"].append(m.end("obj"))
            out["subj_is_pronoun"].append(subj in SUBJECT_PRONOUNS)
    cols = {"conv_id": c_conv, "turn_idx": c_tidx, **out}
    return pa.table(
        {name: pa.array(cols[name], typ) for name, typ in TRIPLE_FIELDS},
        schema=TRIPLE_SCHEMA,
    )
