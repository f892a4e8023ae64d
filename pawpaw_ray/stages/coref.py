"""Cross-turn coreference window — the conversation-ordered shuffle stage.

Semantics (the cross-turn analog of the reference's windowed consolidation,
``/root/reference/pawpaw/arborform/postorator/windowed_join.py:36-47``): a
pronoun-subject triple resolves to the most recent preceding person-entity
*subject* in the same conversation within a window of ``window_turns`` turns
(ordering key ``(turn_idx, s_start)``).  Resolved triples get
``subj_id``/``subj_path``/``subj_canonical`` filled and ``via_coref=True``.

Scale design (the skew story required by the north rule):

* **Salted keys.** The unit of sequential work is ``(conv_id, turn_idx //
  chunk_turns)`` — a mega-conversation holding 20% of all turns becomes many
  bounded chunks instead of one straggler group.
* **Bucketed shuffle.** The groupby key is ``hash(conv_id, chunk) % B`` so
  the shuffle produces B balanced partitions, and each bucket task walks its
  (conv, chunk) subgroups with C-speed pandas grouping — NOT one Ray group
  per key (per-group task overhead dominates at millions of conversations).
* **Chunk stitching, fully distributed.** Antecedent state that crosses a
  chunk boundary travels as *carry rows*: each block emits its last person
  subject per (conv, chunk) (an associative partial — one tiny row per
  (conv, chunk) per block), re-keyed to chunk k+1's bucket and unioned into
  the salted table.  Inside the resolve group they sort ahead of chunk
  k+1's real rows (their turn_idx belongs to chunk k), so the sequential
  antecedent scan both REDUCES the partials (the max-(turn_idx, s_start)
  partial is simply the last one seen) and applies the carry — then the
  rows are dropped.  Because ``chunk_turns > window_turns``, only the
  immediately-preceding chunk's tail can ever be in window, so one carry
  row per chunk suffices.  Nothing touches the driver: at 10^12-turn scale
  the carry table is tens of millions of rows, which a driver-side
  ``to_pandas`` + broadcast dict (the round-2 design) could not hold.

The input triples are materialized once (compact rows, not raw text) because
two consumers traverse them (tail extraction + resolution).  Everything is
deterministic and idempotent, so Ray task retries are safe.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

PERSON_PREFIX = "person"


def _default_buckets() -> int:
    from pawpaw_ray.tuning import shuffle_buckets
    return shuffle_buckets()


def _salted_buckets(conv_vals, chunk: np.ndarray, n_buckets: int) -> np.ndarray:
    """Vectorized salted-bucket assignment for (conv_id, chunk) keys:
    siphash of the conv string XOR splitmix64 of the chunk index, mod
    ``n_buckets``.  Shared by the real rows and the carry partials (which
    re-key to chunk k+1) so a chunk's carries land with its rows; replaces
    the per-row ``zlib.crc32(f"{conv}\\x00{chunk}")`` generator loop."""
    from pawpaw_ray.stages.dedup import _splitmix64

    h = pd.util.hash_array(np.asarray(conv_vals, dtype=object))
    mixed = h ^ _splitmix64(chunk.astype(np.uint64))
    return (mixed % np.uint64(n_buckets)).astype(np.int32)


def _resolve_arrays(turns, pron, subj_id, subj_path, subj_can, via,
                    window_turns: int, carry):
    """Sequential antecedent scan over one (conv, chunk)'s rows (already in
    (turn_idx, s_start) order).  Mutates the slices in place."""
    last_turn = carry["turn"] if carry else None
    last_id = carry["id"] if carry else None
    last_can = carry["can"] if carry else None
    for i in range(len(turns)):
        if pron[i]:
            if last_id is not None and turns[i] - last_turn <= window_turns:
                subj_id[i] = last_id
                subj_path[i] = PERSON_PREFIX
                subj_can[i] = last_can
                via[i] = True
        elif subj_id[i] is not None and str(subj_path[i] or "").startswith(PERSON_PREFIX):
            last_turn, last_id, last_can = turns[i], subj_id[i], subj_can[i]


def resolve_bucket(g: pd.DataFrame, window_turns: int,
                   carry_map: dict | None = None) -> pd.DataFrame:
    """Resolve all (conv, chunk) subgroups of one hash bucket.

    Carry state arrives either as ``carry_map`` (unit-test convenience) or —
    the distributed path — as in-band rows flagged ``is_carry``: they sort
    ahead of the chunk's real rows, feed the antecedent scan, and are
    dropped from the output."""
    g = g.sort_values(["conv_id", "chunk", "turn_idx", "s_start"],
                      kind="mergesort").reset_index(drop=True)
    subj_id = g["subj_id"].to_numpy(dtype=object).copy()
    subj_path = g["subj_path"].to_numpy(dtype=object).copy()
    subj_can = g["subj_canonical"].to_numpy(dtype=object).copy()
    via = np.zeros(len(g), dtype=bool)
    pron = g["subj_is_pronoun"].to_numpy()
    turns = g["turn_idx"].to_numpy()

    # subgroup boundaries via C-speed factorization
    codes, _ = pd.factorize(
        g["conv_id"].astype(str) + "\x00" + g["chunk"].astype(str), sort=False)
    boundaries = np.flatnonzero(np.diff(codes, prepend=-1))
    boundaries = np.append(boundaries, len(g))
    for b0, b1 in zip(boundaries[:-1], boundaries[1:]):
        carry = None
        if carry_map:
            carry = carry_map.get((g["conv_id"].iloc[b0], int(g["chunk"].iloc[b0])))
        _resolve_arrays(turns[b0:b1], pron[b0:b1], subj_id[b0:b1],
                        subj_path[b0:b1], subj_can[b0:b1], via[b0:b1],
                        window_turns, carry)
    g["subj_id"] = subj_id
    g["subj_path"] = subj_path
    g["subj_canonical"] = subj_can
    g["via_coref"] = via
    if "is_carry" in g.columns:
        g = g[~g["is_carry"].to_numpy(dtype=bool)]
    return g


def tails_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Per (conv, chunk): the last person-entity subject row (vectorized —
    input is pre-filtered to candidate antecedent rows only)."""
    g = g.sort_values(["conv_id", "chunk", "turn_idx", "s_start"],
                      kind="mergesort")
    last = g.groupby(["conv_id", "chunk"], sort=False).tail(1)
    return pd.DataFrame({
        "conv_id": last["conv_id"].to_numpy(),
        "chunk": last["chunk"].to_numpy(np.int64),
        "tail_turn": last["turn_idx"].to_numpy(np.int64),
        "tail_id": last["subj_id"].to_numpy(object),
        "tail_can": last["subj_canonical"].to_numpy(object),
    })


def resolve_conv_bucket(g: pd.DataFrame, window_turns: int) -> pd.DataFrame:
    """Resolve one conv-hash bucket: whole conversations are co-located, so
    the antecedent scan needs no carry at all."""
    g = g.sort_values(["conv_id", "turn_idx", "s_start"],
                      kind="mergesort").reset_index(drop=True)
    subj_id = g["subj_id"].to_numpy(dtype=object).copy()
    subj_path = g["subj_path"].to_numpy(dtype=object).copy()
    subj_can = g["subj_canonical"].to_numpy(dtype=object).copy()
    via = np.zeros(len(g), dtype=bool)
    pron = g["subj_is_pronoun"].to_numpy()
    turns = g["turn_idx"].to_numpy()

    codes, _ = pd.factorize(g["conv_id"], sort=False)
    boundaries = np.flatnonzero(np.diff(codes, prepend=-1))
    boundaries = np.append(boundaries, len(g))
    for b0, b1 in zip(boundaries[:-1], boundaries[1:]):
        _resolve_arrays(turns[b0:b1], pron[b0:b1], subj_id[b0:b1],
                        subj_path[b0:b1], subj_can[b0:b1], via[b0:b1],
                        window_turns, None)
    g["subj_id"] = subj_id
    g["subj_path"] = subj_path
    g["subj_canonical"] = subj_can
    g["via_coref"] = via
    return g


def resolve_coref(triples_ds, window_turns: int = 8, chunk_turns: int = 512,
                  n_buckets: int | None = None, salt_chunks: bool = False,
                  add_keys: bool = False):
    """Conversation-ordered coreference in ONE groupby shuffle.

    Default: bucket on ``hash(conv_id) % B`` — whole conversations land in
    one group, the antecedent scan is carry-free, and the stage costs exactly
    one shuffle pass (no tails pass, no extra materialization).

    ``salt_chunks=True`` switches to the salted ``(conv_id, turn_idx //
    chunk_turns)`` keying with carry-table stitching for mega-conversation
    skew (a single conversation holding a significant share of all turns) —
    the bounded-group path the north rule requires at 10^12-turn scale.
    Both variants produce identical output (tests/test_coref.py).
    """
    n_buckets = n_buckets or _default_buckets()
    if not salt_chunks:
        def add_bucket(b: pa.Table) -> pa.Table:
            from pawpaw_ray.tuning import hash_bucket
            buck = hash_bucket(b["conv_id"].to_pandas().to_numpy(object),
                               n_buckets)
            return b.append_column("cbucket", pa.array(buck, pa.int32()))

        if add_keys:
            # fuse canonical-key assignment into the same group pass — one
            # shuffle produces resolve + keys, saving a full map pass over
            # every triple row
            from pawpaw_ray.stages.canonicalize import canonical_keys_pdf

            def group_fn(g: pd.DataFrame) -> pd.DataFrame:
                return canonical_keys_pdf(resolve_conv_bucket(g, window_turns))
        else:
            def group_fn(g: pd.DataFrame) -> pd.DataFrame:
                return resolve_conv_bucket(g, window_turns)

        return (triples_ds
                .map_batches(add_bucket, batch_format="pyarrow")
                .groupby("cbucket")
                .map_groups(group_fn, batch_format="pandas")
                .drop_columns(["cbucket"]))

    assert chunk_turns > window_turns

    def add_salt_cols(b: pa.Table) -> pa.Table:
        turn = b["turn_idx"].to_numpy()
        chunk = (turn // chunk_turns).astype(np.int64)
        conv = b["conv_id"].to_pandas().to_numpy(object)
        buck = _salted_buckets(conv, chunk, n_buckets)
        return (b.append_column("chunk", pa.array(chunk, pa.int64()))
                 .append_column("cbucket", pa.array(buck, pa.int32()))
                 .append_column("is_carry",
                                pa.array(np.zeros(len(conv), dtype=bool))))

    # compact triple rows; two consumers below — pin once so the raw-text
    # upstream (segment/extract/link) executes exactly once
    salted = triples_ds.map_batches(add_salt_cols, batch_format="pyarrow").materialize()

    # Carry rows WITHOUT a driver hop or extra shuffle: each block emits its
    # last antecedent row per (conv, chunk) — an associative partial, one
    # tiny row per (conv, chunk) per block — re-keyed to chunk k+1's bucket
    # and unioned into the salted table.  The resolve scan below finishes
    # the reduce for free (partials sort ahead of chunk k+1's real rows and
    # the last one seen wins) and drops them.  chunk_turns > window_turns
    # guarantees no carry ever reaches further back than one chunk.
    def carry_partials(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.invert(b["subj_is_pronoun"]),
            pc.and_(pc.is_valid(b["subj_id"]),
                    pc.starts_with(pc.coalesce(b["subj_path"], ""), PERSON_PREFIX)))
        t = b.filter(keep)
        if t.num_rows:
            df = t.select(["conv_id", "chunk", "turn_idx", "s_start"]).to_pandas()
            idx = (df.sort_values(["conv_id", "chunk", "turn_idx", "s_start"],
                                  kind="mergesort")
                   .groupby(["conv_id", "chunk"], sort=False)
                   .tail(1).index.to_numpy())
            t = t.take(pa.array(np.sort(idx)))
        # full triple schema kept (non-key payload columns ride along and are
        # dropped with the row post-scan) so union needs no schema surgery
        ck = t["chunk"].to_numpy() + 1
        conv = t["conv_id"].to_pandas().to_numpy(object)
        buck = _salted_buckets(conv, ck.astype(np.int64), n_buckets)
        cols = {"chunk": pa.array(ck, pa.int64()),
                "cbucket": pa.array(buck, pa.int32()),
                "is_carry": pa.array(np.ones(len(conv), dtype=bool))}
        for name, arr in cols.items():
            t = t.set_column(t.schema.get_field_index(name), name, arr)
        return t

    carry_ds = salted.map_batches(carry_partials, batch_format="pyarrow")

    if add_keys:
        from pawpaw_ray.stages.canonicalize import canonical_keys_pdf

        def resolve_group(g: pd.DataFrame) -> pd.DataFrame:
            return canonical_keys_pdf(resolve_bucket(g, window_turns))
    else:
        def resolve_group(g: pd.DataFrame) -> pd.DataFrame:
            return resolve_bucket(g, window_turns)

    resolved = salted.union(carry_ds).groupby("cbucket").map_groups(
        resolve_group, batch_format="pandas")
    return resolved.drop_columns(["chunk", "cbucket", "is_carry"])
