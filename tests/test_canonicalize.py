"""Canonicalization key assignment, entity aggregation, exact dedup."""

import pandas as pd
import pyarrow as pa

from pawpaw_ray.stages.canonicalize import (
    canonical_keys_batch,
    dedup_bucket,
    entity_finalize_bucket,
    normalize_surface,
    synthetic_id,
)


def test_normalize_surface():
    assert normalize_surface("  Acme   Corp.  ") == "acme corp"
    assert normalize_surface('"Smith & Co."') == "smith & co"
    assert normalize_surface("ACME") == "acme"


def test_synthetic_id_deterministic():
    assert synthetic_id("acme corp") == synthetic_id("acme corp")
    assert synthetic_id("acme corp") != synthetic_id("acme")
    assert synthetic_id("x").startswith("unk-")


def _keys_batch(rows):
    cols = {
        "subj": [r[0] for r in rows], "obj": [r[1] for r in rows],
        "subj_id": [r[2] for r in rows], "obj_id": [r[3] for r in rows],
        "subj_is_pronoun": [r[4] for r in rows],
    }
    return canonical_keys_batch(pa.table(cols))


def test_canonical_keys():
    t = _keys_batch([
        ("Acme Corp.", "Ashford", "ent-1", None, False),
        ("ACME", "Bob", None, "ent-2", False),
        ("He", "Acme", None, None, True),
    ])
    keys = t["subj_key"].to_pylist()
    assert keys[0] == "ent-1"                     # linked wins
    assert keys[1] == synthetic_id("acme")        # normalized synthetic
    assert keys[2] is None                        # unresolved pronoun
    assert t["obj_key"].to_pylist()[0] == synthetic_id("ashford")


def test_entity_finalize_prefers_catalog_canonical():
    g = pd.DataFrame({
        "entity_key": ["e1", "e1", "u1", "u1"],
        "entity_path": ["person", "person", "", ""],
        "canonical": ["Alice Brandt", "Alice Brandt", "", ""],
        "surface": ["A. Brandt", "Alice", "acme", "ACME Inc"],
        "n": [5, 9, 3, 1],
    })
    out = entity_finalize_bucket(g).set_index("entity_id")
    assert out.loc["e1", "canonical_surface"] == "Alice Brandt"
    assert out.loc["e1", "n_mentions"] == 14
    assert out.loc["u1", "canonical_surface"] == "acme"  # most frequent


def test_dedup_bucket_first_occurrence_and_counts():
    g = pd.DataFrame({
        "subj_key": ["a", "a", "a", "b"],
        "pred": ["met", "met", "met", "met"],
        "obj_key": ["x", "x", "x", "x"],
        "conv_id": ["c2", "c1", "c1", "c1"],
        "turn_idx": [0, 5, 1, 0],
        "s_start": [0, 0, 0, 0],
    })
    out = dedup_bucket(g).reset_index(drop=True)
    assert len(out) == 2
    a = out[out["subj_key"] == "a"].iloc[0]
    assert (a["conv_id"], a["turn_idx"]) == ("c1", 1)  # earliest provenance
    assert a["n_dups"] == 3
    assert out[out["subj_key"] == "b"].iloc[0]["n_dups"] == 1


def test_sessionize_gap_semantics(ray_session):
    """Gap-based sessionization: session breaks only at gaps > gap_s."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pawpaw_ray.stages.events import sessionize

    base = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: two sessions (gap of 2h), user 2: one session
    for m in [0, 5, 10, 130, 135]:
        rows.append({"user_id": 1, "event_id": len(rows),
                     "ts": base + pd.Timedelta(minutes=m)})
    for m in [0, 20, 40]:
        rows.append({"user_id": 2, "event_id": len(rows),
                     "ts": base + pd.Timedelta(minutes=m)})
    out = (sessionize(rd.from_pandas(pd.DataFrame(rows)), gap_s=1800)
           .to_pandas().sort_values(["user_id", "session_idx"])
           .reset_index(drop=True))
    u1 = out[out["user_id"] == 1]
    assert list(u1["session_idx"]) == [0, 1]
    assert list(u1["n_events"]) == [3, 2]
    u2 = out[out["user_id"] == 2]
    assert list(u2["n_events"]) == [3]
