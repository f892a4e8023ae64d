"""North-rule gate: triple P/R ≥ 0.95 vs the reference-executed extractor
on the same synthetic transcript input (BASELINE.json metric)."""

import pyarrow as pa
import pytest

from pawpaw_ray.datagen import build_catalog, gen_turn
from pawpaw_ray.stages.segment import segment_batch
from pawpaw_ray.stages.triples import triples_batch
from tests.parity_util import reference_triples_for_text, score_pr


@pytest.fixture(scope="module")
def turn_rows():
    ents = build_catalog()
    return [gen_turn(42, c, t, 12, ents) for c in range(100) for t in range(12)]


def test_triple_parity_vs_reference(pawpaw_ref, turn_rows):
    batch = pa.table({
        "conv_id": [r["conv_id"] for r in turn_rows],
        "turn_idx": pa.array([r["turn_idx"] for r in turn_rows], pa.int32()),
        "text": [r["text"] for r in turn_rows],
    })
    tri = triples_batch(segment_batch(batch))

    ours = []
    pdf = tri.to_pandas()
    for r in pdf.itertuples():
        ours.append((r.conv_id, r.turn_idx, r.subj, r.pred, r.obj,
                     r.s_start, r.p_start, r.o_start))

    theirs = []
    for row in turn_rows:
        for t in reference_triples_for_text(pawpaw_ref, row["text"]):
            theirs.append((row["conv_id"], row["turn_idx"], *t))

    precision, recall = score_pr(ours, theirs)
    assert len(theirs) > 100, "fixture should produce a meaningful triple count"
    assert precision >= 0.95, f"precision {precision:.4f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.4f} < 0.95"
    # by construction (same rules, same regex engine) we expect exact parity
    assert precision == pytest.approx(1.0)
    assert recall == pytest.approx(1.0)
