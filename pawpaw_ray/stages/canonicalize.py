"""Canonicalization + exact triple dedup — the two wide shuffles.

Canonicalization (SURVEY.md §2.5, engine-new): every triple endpoint surface
is normalized (casefold, collapse whitespace, strip edge punctuation); linked
surfaces already carry a catalog ``entity_id``; unlinked surfaces get a
deterministic synthetic id ``unk-<sha1(norm)[:12]>`` — a pure function of
the normalized surface, so the mapping is stable under retries and across
partitions WITHOUT any global coordination.  A pronoun subject that coref
could not resolve gets a null key and is excluded from the canonical graph.

Shuffle discipline: both wide steps group on ``hash(key) % B`` buckets, not
on the raw key — B balanced partitions, each reduced with C-speed pandas
grouping inside one task, instead of one Ray group per distinct key (whose
per-group overhead dominates at millions of keys).  The entity aggregation
additionally pre-aggregates per batch (map-side combine) so the shuffle
moves (key, surface, count) partials, not every mention row.

Exact triple dedup is the reference's ``'><'`` unique-axis analog
(``/root/reference/pawpaw/query/_query.py:173-177``): first occurrence by
``(conv_id, turn_idx, s_start)`` wins; the duplicate count is kept as
lineage.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import regex as rx

from pawpaw_ray.tuning import hash_bucket

_NORM_EDGE = rx.compile(r"^[\W_]+|[\W_]+$")
_NORM_WS = rx.compile(r"\s+")

def _default_buckets() -> int:
    from pawpaw_ray.tuning import shuffle_buckets
    return shuffle_buckets()


def normalize_surface(s: str) -> str:
    """casefold + collapse inner whitespace + strip edge punctuation."""
    return _NORM_WS.sub(" ", _NORM_EDGE.sub("", s)).casefold()


def synthetic_id(norm: str) -> str:
    return "unk-" + hashlib.sha1(norm.encode()).hexdigest()[:12]


def canonical_keys_pdf(df: pd.DataFrame) -> pd.DataFrame:
    """Append ``subj_key`` / ``obj_key`` (see module docstring), vectorized:
    normalization + sha1 run once per UNIQUE unlinked surface, not per row."""
    pron = (df["subj_is_pronoun"].to_numpy()
            if "subj_is_pronoun" in df.columns
            else np.zeros(len(df), dtype=bool))
    for side in ("subj", "obj"):
        ids = df[f"{side}_id"]
        keys = ids.copy()
        unlinked = ids.isna().to_numpy()
        if side == "subj":
            # unresolved pronoun: no entity (null key)
            unlinked = unlinked & ~pron
        if unlinked.any():
            surf = df.loc[unlinked, side]
            uniq = pd.unique(surf)
            lut = {s: synthetic_id(normalize_surface(s)) for s in uniq}
            keys[unlinked] = surf.map(lut)
        df[f"{side}_key"] = keys
    return df


def canonical_keys_batch(batch: pa.Table) -> pa.Table:
    """Arrow wrapper over :func:`canonical_keys_pdf`."""
    return pa.Table.from_pandas(
        canonical_keys_pdf(batch.to_pandas()), preserve_index=False)


# ---------------------------------------------------------------------------
# entity table (map-side combine → bucketed final reduce)
# ---------------------------------------------------------------------------

def entity_partials_batch(batch: pa.Table, n_buckets: int | None = None) -> pa.Table:
    """Per-batch partial aggregation of triple endpoints:
    (entity_key, entity_path, canonical, surface) → count."""
    n_buckets = n_buckets or _default_buckets()
    frames = []
    for side in ("subj", "obj"):
        frames.append(pd.DataFrame({
            "entity_key": batch[f"{side}_key"].to_pandas(),
            "entity_path": batch[f"{side}_path"].to_pandas().fillna(""),
            "canonical": (batch[f"{side}_canonical"].to_pandas()
                          if f"{side}_canonical" in batch.column_names
                          else pd.Series([None] * len(batch), dtype=object)),
            "surface": batch[side].to_pandas(),
        }))
    df = pd.concat(frames, ignore_index=True)
    df = df[df["entity_key"].notna()]
    df["canonical"] = df["canonical"].fillna("")
    agg = (df.groupby(["entity_key", "entity_path", "canonical", "surface"],
                      sort=False)
             .size().reset_index(name="n"))
    agg["ebucket"] = hash_bucket(agg["entity_key"].to_numpy(), n_buckets)
    return pa.Table.from_pandas(agg, preserve_index=False)


def entity_finalize_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Final reduce of one bucket: total mentions + deterministic canonical
    surface per entity (catalog canonical wins; else most frequent surface,
    ties broken lexicographically)."""
    totals = g.groupby("entity_key", sort=False)["n"].sum()
    paths = g.groupby("entity_key", sort=False)["entity_path"].max()
    cat = g[g["canonical"] != ""].groupby("entity_key", sort=False)["canonical"].min()
    surf = (g.groupby(["entity_key", "surface"], sort=False)["n"].sum()
              .reset_index()
              .sort_values(["entity_key", "n", "surface"],
                           ascending=[True, False, True], kind="mergesort")
              .drop_duplicates("entity_key")
              .set_index("entity_key")["surface"])
    rep = cat.reindex(totals.index)
    rep = rep.fillna(surf.reindex(totals.index))
    return pd.DataFrame({
        "entity_id": totals.index.to_numpy(object),
        "entity_path": paths.reindex(totals.index).to_numpy(object),
        "canonical_surface": rep.to_numpy(object),
        "n_mentions": totals.to_numpy(np.int64),
    })


def build_entity_table(triples_keyed_ds, n_buckets: int | None = None):
    n_buckets = n_buckets or _default_buckets()
    partials = triples_keyed_ds.map_batches(
        lambda b: entity_partials_batch(b, n_buckets), batch_format="pyarrow")
    return (partials.groupby("ebucket")
            .map_groups(entity_finalize_bucket, batch_format="pandas"))


# ---------------------------------------------------------------------------
# exact triple dedup (bucketed)
# ---------------------------------------------------------------------------

def _first_with_counts(g: pd.DataFrame) -> pd.DataFrame:
    """Associative first-occurrence combine: keep each triple key's first
    row by (conv_id, turn_idx, s_start) and sum its ``n_dups``.  Applied
    per batch (map-side, ``n_dups`` pre-set to 1) and again per bucket —
    the global first is the first among batch-firsts, and duplicate counts
    add, so partial+final equals the old single-pass dedup exactly."""
    if "n_dups" not in g.columns:  # raw rows (not partials): each counts 1
        g = g.copy()
        g["n_dups"] = np.int64(1)
    g = g.sort_values(["subj_key", "pred", "obj_key",
                       "conv_id", "turn_idx", "s_start"], kind="mergesort")
    grp = g.groupby(["subj_key", "pred", "obj_key"], sort=False)
    first = g.drop_duplicates(["subj_key", "pred", "obj_key"]).copy()
    first["n_dups"] = grp["n_dups"].sum().to_numpy(np.int64)
    return first


def add_triple_bucket(batch: pa.Table, n_buckets: int | None = None) -> pa.Table:
    """Map-side stage of the triple dedup: drop null-subject rows, combine
    local duplicates (first occurrence + partial count — duplicate triples
    cluster within conversations, so most duplicate ROWS never cross the
    shuffle), and assign the triple-key bucket (vectorized hash)."""
    n_buckets = n_buckets or _default_buckets()
    keep = batch.filter(pc.is_valid(batch["subj_key"]))
    df = _first_with_counts(keep.to_pandas())
    key = (df["subj_key"] + "\x00" + df["pred"] + "\x00" + df["obj_key"])
    df["tbucket"] = hash_bucket(key.to_numpy(), n_buckets)
    # pin the Arrow schema: from_pandas would re-infer per batch and an
    # all-null column (e.g. subj_canonical) then drifts to pa.null(),
    # splitting the shuffle's block schemas
    sch = (keep.schema.append(pa.field("n_dups", pa.int64()))
                      .append(pa.field("tbucket", pa.int32())))
    return pa.Table.from_pandas(df, schema=sch, preserve_index=False)


def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Final reduce of one triple-key bucket (input rows are map-side
    partials carrying ``n_dups``)."""
    return _first_with_counts(g)


def dedup_triples(triples_keyed_ds, n_buckets: int | None = None):
    """Canonical triples: unresolved-pronoun rows (null subj_key) are
    excluded from the canonical graph; the rest dedup exactly on
    (subj_key, pred, obj_key), first occurrence by (conv_id, turn_idx,
    s_start) winning and the duplicate count kept as lineage."""
    # resolve the fan-out ON THE DRIVER: shipping None would make each
    # worker call shuffle_buckets() per batch — an RPC per batch, and on an
    # autoscaling cluster two batches could disagree on the bucket count,
    # splitting identical triple keys across tbucket groups
    n_buckets = n_buckets or _default_buckets()
    bucketed = triples_keyed_ds.map_batches(
        lambda b: add_triple_bucket(b, n_buckets), batch_format="pyarrow")
    return (bucketed.groupby("tbucket")
            .map_groups(dedup_bucket, batch_format="pandas")
            .drop_columns(["tbucket"]))
