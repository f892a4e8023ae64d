"""Canonicalization + exact triple dedup — the two wide shuffles.

Canonicalization (SURVEY.md §2.5, engine-new): every triple endpoint surface
is normalized (casefold, collapse whitespace, strip edge punctuation); linked
surfaces already carry a catalog ``entity_id``; unlinked surfaces get a
deterministic synthetic id ``unk-<sha1(norm)[:12]>`` so the mapping is stable
under retries and across partitions WITHOUT a global shuffle — the id is a
pure function of the normalized surface.  The entity table (one row per
canonical id with mention count and a deterministic representative surface)
is produced by a ``groupby`` over the much smaller endpoint rows, with a
per-batch partial pre-aggregation so the shuffle moves (id, surface, count)
partials instead of every mention row.

Exact triple dedup (reference analog: the ``'><'`` unique axis,
``/root/reference/pawpaw/query/_query.py:173-177``): hash-group on the
canonical key ``(subj_key, pred, obj_key)`` keeping the first occurrence by
``(conv_id, turn_idx, s_start)`` and a duplicate count for lineage.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import regex as rx

_NORM_EDGE = rx.compile(r"^[\W_]+|[\W_]+$")
_NORM_WS = rx.compile(r"\s+")


def normalize_surface(s: str) -> str:
    """casefold + collapse inner whitespace + strip edge punctuation."""
    return _NORM_WS.sub(" ", _NORM_EDGE.sub("", s)).casefold()


def synthetic_id(norm: str) -> str:
    return "unk-" + hashlib.sha1(norm.encode()).hexdigest()[:12]


def canonical_keys_batch(batch: pa.Table) -> pa.Table:
    """Append ``subj_key`` / ``obj_key``: the catalog entity id when linked,
    else the deterministic synthetic id of the normalized surface."""
    out_keys = {}
    for side in ("subj", "obj"):
        ids = batch[f"{side}_id"].to_pylist()
        surfaces = batch[side].to_pylist()
        keys = [i if i is not None else synthetic_id(normalize_surface(s))
                for i, s in zip(ids, surfaces)]
        out_keys[f"{side}_key"] = pa.array(keys, pa.string())
    t = batch
    for k, v in out_keys.items():
        t = t.append_column(k, v)
    return t


# ---------------------------------------------------------------------------
# entity table (groupby with partial pre-aggregation)
# ---------------------------------------------------------------------------

def entity_partials_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial aggregation of triple endpoints:
    (entity_key, entity_path, surface) → count.  Shrinks the shuffle input
    from one row per endpoint to one row per distinct surface per batch."""
    frames = []
    for side in ("subj", "obj"):
        frames.append(pd.DataFrame({
            "entity_key": batch[f"{side}_key"].to_pandas(),
            "entity_path": batch[f"{side}_path"].to_pandas().fillna(""),
            "surface": batch[side].to_pandas(),
        }))
    df = pd.concat(frames, ignore_index=True)
    agg = (df.groupby(["entity_key", "entity_path", "surface"], sort=False)
             .size().reset_index(name="n"))
    return pa.Table.from_pandas(agg, preserve_index=False)


def entity_finalize_group(g: pd.DataFrame) -> pd.DataFrame:
    """Final per-entity reduce: total mentions + deterministic canonical
    surface = most frequent, ties broken lexicographically."""
    by_surface = g.groupby("surface", sort=False)["n"].sum()
    # sort by (-count, surface) → first row is the canonical representative
    rep = by_surface.sort_index().sort_values(ascending=False, kind="mergesort").index[0]
    return pd.DataFrame({
        "entity_id": [g["entity_key"].iloc[0]],
        "entity_path": [max(p for p in g["entity_path"])],
        "canonical_surface": [rep],
        "n_mentions": [np.int64(g["n"].sum())],
    })


def build_entity_table(triples_keyed_ds):
    """triples (with keys) → entity table Dataset."""
    partials = triples_keyed_ds.map_batches(entity_partials_batch, batch_format="pyarrow")
    return partials.groupby("entity_key").map_groups(
        entity_finalize_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact triple dedup
# ---------------------------------------------------------------------------

def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
    """Keep the first occurrence by (conv_id, turn_idx, s_start); record the
    duplicate count as lineage."""
    g = g.sort_values(["conv_id", "turn_idx", "s_start"], kind="mergesort")
    first = g.iloc[[0]].copy()
    first["n_dups"] = np.int64(len(g))
    return first


def dedup_triples(triples_keyed_ds):
    return triples_keyed_ds.groupby(["subj_key", "pred", "obj_key"]).map_groups(
        dedup_group, batch_format="pandas")
