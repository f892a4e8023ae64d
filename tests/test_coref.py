"""Coreference window semantics: in-chunk resolution, window expiry,
chunk-boundary carry stitching, and bucket grouping."""

import pandas as pd
import pytest

from pawpaw_ray.stages.coref import resolve_bucket, tails_bucket


def mk(rows):
    return pd.DataFrame(rows, columns=[
        "conv_id", "chunk", "turn_idx", "s_start", "subj", "subj_is_pronoun",
        "subj_id", "subj_path", "subj_canonical"])


def test_in_chunk_resolution_and_window_expiry():
    g = mk([
        ("c1", 0, 0, 0, "Alice Brandt", False, "ent-1", "person", "Alice Brandt"),
        ("c1", 0, 2, 0, "He", True, None, None, None),        # within window
        ("c1", 0, 20, 0, "He", True, None, None, None),       # expired (W=8)
    ])
    out = resolve_bucket(g, window_turns=8, carry_map=None)
    out = out.sort_values("turn_idx").reset_index(drop=True)
    assert out.loc[1, "subj_id"] == "ent-1" and out.loc[1, "via_coref"]
    assert out.loc[1, "subj_canonical"] == "Alice Brandt"
    assert out.loc[2, "subj_id"] is None and not out.loc[2, "via_coref"]


def test_most_recent_antecedent_wins():
    g = mk([
        ("c1", 0, 0, 0, "Alice Brandt", False, "ent-1", "person", "Alice Brandt"),
        ("c1", 0, 1, 0, "Bob Costa", False, "ent-2", "person", "Bob Costa"),
        ("c1", 0, 2, 0, "He", True, None, None, None),
    ])
    out = resolve_bucket(g, 8, None).sort_values("turn_idx").reset_index(drop=True)
    assert out.loc[2, "subj_id"] == "ent-2"


def test_org_subjects_are_not_antecedents():
    g = mk([
        ("c1", 0, 0, 0, "Acme Corp", False, "ent-9", "org.company", "Acme Corp"),
        ("c1", 0, 1, 0, "He", True, None, None, None),
    ])
    out = resolve_bucket(g, 8, None).sort_values("turn_idx").reset_index(drop=True)
    assert out.loc[1, "subj_id"] is None


def test_same_turn_ordering_by_s_start():
    g = mk([
        ("c1", 0, 3, 50, "He", True, None, None, None),   # later in the turn
        ("c1", 0, 3, 10, "Alice Brandt", False, "ent-1", "person", "Alice Brandt"),
    ])
    out = resolve_bucket(g, 8, None).sort_values("s_start").reset_index(drop=True)
    assert out.loc[1, "subj_id"] == "ent-1" and out.loc[1, "via_coref"]


def test_carry_across_chunk_boundary():
    # antecedent in chunk 0 (turn 510), pronoun in chunk 1 (turn 513, W=8)
    g0 = mk([("c1", 0, 510, 0, "Alice Brandt", False, "ent-1", "person", "Alice Brandt")])
    tails = tails_bucket(g0.assign(via_coref=False))
    assert len(tails) == 1 and tails.iloc[0]["tail_turn"] == 510

    carry_map = {("c1", 1): {"turn": 510, "id": "ent-1", "can": "Alice Brandt"}}
    g1 = mk([
        ("c1", 1, 513, 0, "He", True, None, None, None),
        ("c1", 1, 600, 0, "He", True, None, None, None),  # out of window
    ])
    out = resolve_bucket(g1, 8, carry_map).sort_values("turn_idx").reset_index(drop=True)
    assert out.loc[0, "subj_id"] == "ent-1" and out.loc[0, "via_coref"]
    assert out.loc[1, "subj_id"] is None


def test_in_chunk_antecedent_preferred_over_carry():
    carry_map = {("c1", 1): {"turn": 511, "id": "ent-1", "can": "A"}}
    g = mk([
        ("c1", 1, 512, 0, "Bob Costa", False, "ent-2", "person", "Bob Costa"),
        ("c1", 1, 513, 0, "He", True, None, None, None),
    ])
    out = resolve_bucket(g, 8, carry_map).sort_values("turn_idx").reset_index(drop=True)
    assert out.loc[1, "subj_id"] == "ent-2"


def test_salted_and_unsalted_paths_agree(ray_session):
    """The conv-bucket fast path and the salted-chunk skew path must emit
    identical resolutions — including across chunk boundaries of a
    mega-conversation."""
    import ray.data as rd

    from pawpaw_ray.stages.coref import resolve_coref

    rows = []
    # mega-conversation: person antecedents + pronouns straddling the
    # chunk_turns=16 boundaries (window 8)
    for t in range(0, 200, 5):
        rows.append(("mega", 0, t, 0, "Alice Brandt", False,
                     "ent-1", "person", "Alice Brandt"))
        rows.append(("mega", 0, t + 2, 0, "He", True, None, None, None))
    for c in range(20):  # plus many small conversations
        rows.append((f"c{c}", 0, 0, 0, "Bob Costa", False,
                     "ent-2", "person", "Bob Costa"))
        rows.append((f"c{c}", 0, 3, 0, "She", True, None, None, None))
        rows.append((f"c{c}", 0, 99, 0, "She", True, None, None, None))
    pdf = mk(rows).drop(columns=["chunk"])
    ds = rd.from_pandas(pdf).repartition(6)

    key = ["conv_id", "turn_idx", "s_start"]
    fast = (resolve_coref(ds, window_turns=8)
            .to_pandas().sort_values(key).reset_index(drop=True))
    salted = (resolve_coref(ds, window_turns=8, chunk_turns=16,
                            salt_chunks=True)
              .to_pandas().sort_values(key).reset_index(drop=True))
    assert fast["via_coref"].sum() > 0
    pd.testing.assert_frame_equal(
        fast[key + ["subj_id", "via_coref", "subj_canonical"]],
        salted[key + ["subj_id", "via_coref", "subj_canonical"]])


def test_salted_output_invariant_to_block_count(ray_session):
    """The distributed carry reduce emits one partial per (conv, chunk) per
    block; the resolved output must not depend on how the input is blocked."""
    import ray.data as rd

    from pawpaw_ray.stages.coref import resolve_coref

    rows = []
    for t in range(0, 300, 3):
        rows.append(("mega", 0, t, 0, "Alice Brandt", False,
                     "ent-1", "person", "Alice Brandt"))
        rows.append(("mega", 0, t + 1, 0, "He", True, None, None, None))
    pdf = mk(rows).drop(columns=["chunk"])

    key = ["conv_id", "turn_idx", "s_start"]
    outs = []
    for nblocks in (1, 7):
        ds = rd.from_pandas(pdf).repartition(nblocks)
        out = (resolve_coref(ds, window_turns=8, chunk_turns=16,
                             salt_chunks=True)
               .to_pandas().sort_values(key).reset_index(drop=True))
        outs.append(out[key + ["subj_id", "via_coref", "subj_canonical"]])
    assert outs[0]["via_coref"].sum() > 0
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_multiple_conversations_in_one_bucket_stay_isolated():
    g = mk([
        ("c1", 0, 0, 0, "Alice Brandt", False, "ent-1", "person", "Alice Brandt"),
        ("c2", 0, 1, 0, "He", True, None, None, None),  # different conv
    ])
    out = resolve_bucket(g, 8, None)
    he = out[out["subj"] == "He"].iloc[0]
    assert he["subj_id"] is None and not he["via_coref"]
