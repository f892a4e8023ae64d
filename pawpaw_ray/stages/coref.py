"""Cross-turn coreference window — the conversation-ordered shuffle stage.

Semantics (the cross-turn analog of the reference's windowed consolidation,
``/root/reference/pawpaw/arborform/postorator/windowed_join.py:36-47``): a
pronoun-subject triple resolves to the most recent preceding person-entity
*subject* in the same conversation within a window of ``window_turns`` turns
(ordering key ``(turn_idx, s_start)``).  Resolved triples get
``subj_id``/``subj_path`` filled and ``via_coref=True``.

Scale design (the skew story required by the north rule): conversations are
hash-partitioned and each is processed *in chunks* of ``chunk_turns`` turns —
the salted key is ``(conv_id, turn_idx // chunk_turns)`` — so a
mega-conversation holding 20% of all turns becomes many bounded groups
instead of one straggler.  Chunk-boundary correctness is restored with an
overlap-stitching second pass:

  1. pass A (salted groupby): resolve pronouns against in-chunk antecedents;
     emit per-chunk tail state (last person subject + its turn) separately.
  2. tail states are forward-filled per conversation (a tiny per-conv group:
     one row per chunk, i.e. 1/chunk_turns of the input) into a carry table.
  3. pass B: the still-unresolved pronouns in the first ``window_turns``
     turns of each chunk are joined (broadcast — the carry table is small by
     construction) against the carry state and resolved if within window.

Everything is deterministic and idempotent, so Ray task retries are safe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

PERSON_PREFIX = "person"


def _resolve_group(g: pd.DataFrame, window_turns: int,
                   carry: dict | None = None) -> pd.DataFrame:
    """Resolve pronouns inside one (conv_id, chunk) group, scanning in
    (turn_idx, s_start) order.  ``carry`` optionally supplies the antecedent
    state carried in from previous chunks: {"turn": int, "id": str}."""
    g = g.sort_values(["turn_idx", "s_start"], kind="mergesort").reset_index(drop=True)
    subj_id = g["subj_id"].to_numpy(dtype=object).copy()
    subj_path = g["subj_path"].to_numpy(dtype=object).copy()
    via = np.zeros(len(g), dtype=bool)
    pron = g["subj_is_pronoun"].to_numpy()
    turns = g["turn_idx"].to_numpy()

    last_turn = carry["turn"] if carry else None
    last_id = carry["id"] if carry else None
    for i in range(len(g)):
        if pron[i]:
            if last_id is not None and turns[i] - last_turn <= window_turns:
                subj_id[i] = last_id
                subj_path[i] = PERSON_PREFIX
                via[i] = True
        elif subj_id[i] is not None and str(subj_path[i] or "").startswith(PERSON_PREFIX):
            last_turn, last_id = turns[i], subj_id[i]
    g["subj_id"] = subj_id
    g["subj_path"] = subj_path
    g["via_coref"] = via
    return g


def _tail_state(g: pd.DataFrame) -> pd.DataFrame:
    """Per-chunk tail state: last person-entity subject and its turn."""
    g = g.sort_values(["turn_idx", "s_start"], kind="mergesort")
    mask = (~g["subj_is_pronoun"]) & g["subj_id"].notna() & \
        g["subj_path"].fillna("").str.startswith(PERSON_PREFIX)
    sel = g[mask]
    if len(sel) == 0:
        return pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                             "chunk": pd.Series([], dtype=np.int64),
                             "tail_turn": pd.Series([], dtype=np.int64),
                             "tail_id": pd.Series([], dtype=object)})
    last = sel.iloc[-1]
    return pd.DataFrame({
        "conv_id": [last["conv_id"]],
        "chunk": [np.int64(last["chunk"])],
        "tail_turn": [np.int64(last["turn_idx"])],
        "tail_id": [last["subj_id"]],
    })


def _forward_fill(g: pd.DataFrame) -> pd.DataFrame:
    """Per conversation: carry-in state for chunk k = latest tail among
    chunks < k.  Input: one row per chunk with a tail; output: one row per
    successor chunk that has something to inherit."""
    g = g.sort_values("chunk", kind="mergesort")
    rows = {"conv_id": [], "chunk": [], "carry_turn": [], "carry_id": []}
    for i in range(len(g)):
        rows["conv_id"].append(g["conv_id"].iloc[i])
        rows["chunk"].append(np.int64(g["chunk"].iloc[i] + 1))
        rows["carry_turn"].append(np.int64(g["tail_turn"].iloc[i]))
        rows["carry_id"].append(g["tail_id"].iloc[i])
    # note: only the immediately-previous chunk's tail matters for a window
    # smaller than chunk_turns; tails older than one chunk are out of window
    # by construction (chunk_turns > window_turns is enforced by the caller).
    return pd.DataFrame(rows)


def resolve_coref(triples_ds, window_turns: int = 8, chunk_turns: int = 512):
    """Apply the salted two-pass coreference resolution to a linked triples
    Dataset.  Requires ``chunk_turns > window_turns`` (so a carry never has
    to skip over more than one chunk boundary)."""
    assert chunk_turns > window_turns
    import ray

    def add_chunk(b: pa.Table) -> pa.Table:
        chunk = pa.compute.cast(
            pa.compute.floor(pa.compute.divide(
                pa.compute.cast(b["turn_idx"], pa.float64()), float(chunk_turns))),
            pa.int64())
        return b.append_column("chunk", chunk)

    salted = triples_ds.map_batches(add_chunk, batch_format="pyarrow")

    # pass A: in-chunk resolution (salted groups bound straggler size).
    # Materialize the result — it is consumed twice (tail states + stitch)
    # and is compact triple rows, NOT the raw text; without this the whole
    # segmentation/extraction upstream would execute twice.
    pass_a = salted.groupby(["conv_id", "chunk"]).map_groups(
        lambda g: _resolve_group(g, window_turns), batch_format="pandas"
    ).materialize()

    # tail states per chunk → forward fill per conversation → carry table
    # (tail state ignores pronoun rows, so computing it post-resolution is
    # equivalent to computing it on the raw input)
    tails = pass_a.groupby(["conv_id", "chunk"]).map_groups(
        _tail_state, batch_format="pandas")
    carry_pdf = tails.groupby("conv_id").map_groups(
        _forward_fill, batch_format="pandas").to_pandas()
    carry_map = {
        (r.conv_id, int(r.chunk)): {"turn": int(r.carry_turn), "id": r.carry_id}
        for r in carry_pdf.itertuples()
    }
    carry_ref = ray.put(carry_map)

    # pass B: stitch chunk boundaries — only pronouns in the first
    # window_turns of a chunk can be affected
    def stitch(b: pd.DataFrame) -> pd.DataFrame:
        cm = ray.get(carry_ref)
        if not cm:
            return b
        unresolved = b["subj_is_pronoun"] & ~b["via_coref"]
        if not unresolved.any():
            return b
        for i in b.index[unresolved]:
            key = (b.at[i, "conv_id"], int(b.at[i, "chunk"]))
            carry = cm.get(key)
            if carry is not None and b.at[i, "turn_idx"] - carry["turn"] <= window_turns:
                # pass A already preferred any in-chunk antecedent (always
                # more recent than a carry); reaching here means none
                # preceded this row within the window, so the carry wins
                b.at[i, "subj_id"] = carry["id"]
                b.at[i, "subj_path"] = PERSON_PREFIX
                b.at[i, "via_coref"] = True
        return b

    resolved = pass_a.map_batches(stitch, batch_format="pandas")
    return resolved.drop_columns(["chunk"])
