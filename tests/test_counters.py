"""Cluster-wide observability counters (state/counters.py): events noted
inside distributed map tasks must be readable as one aggregate from the
driver — the mechanism that surfaces capped-bucket / clamp events in
bench.py's JSON line."""


def test_event_counters_aggregate_from_workers(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pawpaw_ray.state.counters import (
        note_event,
        reset_events,
        snapshot_events,
    )

    reset_events()

    def fn(b: pa.Table) -> pa.Table:
        note_event("test_evt", len(b))
        return b

    n = (rd.range(100, override_num_blocks=4)
         .map_batches(fn, batch_format="pyarrow").count())
    assert n == 100
    # increments are fire-and-forget from workers: settle briefly
    import time
    for _ in range(50):
        if snapshot_events().get("test_evt") == 100:
            break
        time.sleep(0.1)
    assert snapshot_events().get("test_evt") == 100
    reset_events()
    assert snapshot_events().get("test_evt") is None


def test_keep_best_clamp_counted(ray_session):
    import pandas as pd
    import ray.data as rd

    from pawpaw_ray.stages.dedup import dedup_keep_best
    from pawpaw_ray.state.counters import reset_events, snapshot_events

    reset_events()
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["same twin text here"] * 2 + ["unrelated totally distinct"],
        # score above 2^score_bits - 1 must clamp AND be counted
        "n_chars": [1 << 30, 1 << 30, 10],
    })
    out = dedup_keep_best(rd.from_pandas(df), bands=16).to_pandas()
    assert len(out) == 2
    # both clamped scores tie -> min id kept (documented semantics)
    assert out.set_index("cluster_id").loc[1, "keep_id"] == 1
    import time
    for _ in range(50):
        if snapshot_events().get("keep_best_score_clamp", 0) >= 2:
            break
        time.sleep(0.1)
    assert snapshot_events().get("keep_best_score_clamp", 0) >= 2
    reset_events()
