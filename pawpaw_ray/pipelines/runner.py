"""Resumable sharded runner — checkpointed execution of the KG pipeline.

Layout and resume semantics are in :mod:`pawpaw_ray.state.manifests`.

**Phase A (per input-file shard, skipped on rerun when the shard's manifest
exists): segment → extract → link.** Strictly per-row work — correct under
ANY file layout, which matters because real transcript dumps (and our
Ray-written fixture) interleave a conversation's turns across files.

**Phase B (global): coref shuffle → canonical keys → dedup → entities.**
Conversation ordering is restored here by the salted conv-shuffle over the
COMPACT phase-A triple rows (~1% of the text volume), so cross-turn
windows see whole conversations regardless of how the input was sharded.
(An earlier design ran coref inside phase A under a conversation-contiguous
shard assumption; on the interleaved fixture that silently lost 37% of
pronoun resolutions — phase placement is correctness, not taste.)

At 100 TB: phase A is embarrassingly parallel per shard and restartable at
shard granularity; phase B shuffles only triple rows (orders of magnitude
smaller than the input text).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time

import pyarrow.parquet as pq

from pawpaw_ray.pipelines.kg import build_kg, extract_linked_triples
from pawpaw_ray.sources.transcripts import read_transcripts, transcript_files
from pawpaw_ray.stages.canonicalize import build_entity_table, dedup_triples
from pawpaw_ray.stages.coref import resolve_coref
from pawpaw_ray.state.manifests import (
    is_complete,
    manifest_path,
    read_manifests,
    write_manifest,
)


def _shards(files: list[str], n_shards: int) -> list[list[str]]:
    """CONTIGUOUS file ranges — conversation logs are written in conv/time
    order, so adjacent files hold adjacent conversations and only the
    conversations straddling a shard boundary can lose cross-turn window
    context (striping would chop every conversation instead)."""
    n_shards = max(1, min(n_shards, len(files)))
    per = (len(files) + n_shards - 1) // n_shards
    return [files[i * per:(i + 1) * per] for i in range(n_shards)
            if files[i * per:(i + 1) * per]]


def _fresh_dir(d: str) -> str:
    """Clear-and-recreate an output dir: ray's write_parquet adds files to an
    existing directory, so a redone partition must start empty for the
    output to stay deterministic."""
    if os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)
    return d


def run_phase_a(shard_files: list[str], catalog, out_dir: str) -> dict:
    """One shard: transcripts → linked candidate triples → parquet.

    Per-row only (no cross-turn state) — shard-layout independent."""
    _fresh_dir(out_dir)
    ds = read_transcripts(shard_files)
    linked = extract_linked_triples(ds, catalog)
    linked.write_parquet(out_dir)
    n_rows = sum(pq.read_metadata(os.path.join(out_dir, f)).num_rows
                 for f in os.listdir(out_dir) if f.endswith(".parquet"))
    content_hash = hashlib.sha1(
        "".join(sorted(os.listdir(out_dir))).encode()).hexdigest()[:16]
    return {"inputs": shard_files, "rows": n_rows, "files_hash": content_hash}


def run_resumable(
    input_path: str,
    out_root: str,
    catalog=None,
    n_shards: int = 8,
    window_turns: int = 8,
    chunk_turns: int = 512,
    verbose: bool = False,
) -> dict:
    """Run (or resume) the full KG build.  Returns summary metrics."""
    t0 = time.monotonic()
    files = transcript_files(input_path)
    if catalog is None:
        cat_path = os.path.join(input_path, "alias_catalog.parquet")
        catalog = pq.read_table(cat_path)

    os.makedirs(out_root, exist_ok=True)
    shards = _shards(files, n_shards)
    manifests = read_manifests(out_root)
    valid_parts = {f"part-{i:05d}" for i in range(len(shards))}
    skipped = ran = 0
    for i, shard in enumerate(shards):
        part = f"part-{i:05d}"
        # a manifest only proves completeness for the SAME inputs: a rerun
        # with a different n_shards / file list must redo the shard, not
        # reuse a mismatched prior output
        if is_complete(out_root, part) and \
                manifests.get(part, {}).get("inputs") == shard:
            skipped += 1
            continue
        part_dir = os.path.join(out_root, "triples_raw", part)
        payload = run_phase_a(shard, catalog, part_dir)
        payload.update({
            "phase": "A", "part": part,
            "elapsed_s": round(time.monotonic() - t0, 2),
        })
        write_manifest(out_root, part, payload)
        ran += 1
        if verbose:
            print(f"[runner] {part}: {payload['rows']} rows")

    # prune leftover part dirs from a prior run with more shards — phase B
    # must read exactly the current shard list, nothing stale
    raw_root = os.path.join(out_root, "triples_raw")
    for leftover in sorted(os.listdir(raw_root)) if os.path.isdir(raw_root) else []:
        if leftover.startswith("part-") and leftover not in valid_parts:
            shutil.rmtree(os.path.join(raw_root, leftover))
            stale_manifest = os.path.join(out_root, "_manifests", f"{leftover}.json")
            if os.path.exists(stale_manifest):
                os.remove(stale_manifest)

    final = _run_phase_b(out_root, sorted(valid_parts), window_turns,
                         chunk_turns, t0, ran, skipped)
    write_manifest(out_root, "final", final)
    return final


def _run_phase_b(out_root: str, parts: list[str], window_turns: int,
                 chunk_turns: int, t0: float, ran: int, skipped: int) -> dict:
    """Global phase: conv-ordered coref + canonical tables over the compact
    phase-A triple rows of exactly ``parts``."""
    import ray.data as rd

    raw_root = os.path.join(out_root, "triples_raw")
    part_files = [
        os.path.join(raw_root, p, f)
        for p in parts
        for f in sorted(os.listdir(os.path.join(raw_root, p)))
        if f.endswith(".parquet")]
    linked = rd.read_parquet(part_files)
    keyed = resolve_coref(linked, window_turns, chunk_turns,
                          salt_chunks=True, add_keys=True).materialize()
    triples = dedup_triples(keyed)
    entities = build_entity_table(keyed)
    triples_dir = _fresh_dir(os.path.join(out_root, "triples"))
    entities_dir = _fresh_dir(os.path.join(out_root, "entities"))
    triples.write_parquet(triples_dir)
    entities.write_parquet(entities_dir)

    n_triples = sum(pq.read_metadata(os.path.join(triples_dir, f)).num_rows
                    for f in os.listdir(triples_dir) if f.endswith(".parquet"))
    n_entities = sum(pq.read_metadata(os.path.join(entities_dir, f)).num_rows
                     for f in os.listdir(entities_dir) if f.endswith(".parquet"))
    manifests = read_manifests(out_root)
    raw_rows = sum(m.get("rows", 0) for p, m in manifests.items()
                   if p in parts and m.get("phase") == "A")
    return {
        "phase": "B", "triples": n_triples, "entities": n_entities,
        "raw_triples": raw_rows, "shards_run": ran, "shards_skipped": skipped,
        "elapsed_s": round(time.monotonic() - t0, 2),
    }


def _ipart_name(rel: str) -> str:
    return "ipart-" + hashlib.sha1(rel.encode()).hexdigest()[:12]


def run_incremental(
    input_path: str,
    out_root: str,
    catalog=None,
    window_turns: int = 8,
    chunk_turns: int = 512,
    verbose: bool = False,
) -> dict:
    """Incremental / ongoing-ingest mode: manifest-diff over input FILES.

    One phase-A partition per input file, keyed by the file's identity
    (relative path hash) rather than its position in the listing — so
    dropping new shard files into ``input_path`` reprocesses ONLY those
    files, while :func:`run_resumable`'s positional shard plan would
    invalidate every shard.  A file is redone when its manifest is
    missing/corrupt or its byte size changed.  Partitions whose input file
    disappeared are pruned.

    Phase B (the global coref shuffle + canonical tables) is cheap
    relative to phase A (it reads compact triple rows, ~1% of the text
    volume) and must see ALL conversations, so it reruns whenever the
    partition set or any partition's content changed — and is skipped
    entirely on a no-change rerun (the final manifest records the exact
    per-partition content hashes it was built from).
    """
    t0 = time.monotonic()
    files = transcript_files(input_path)
    if catalog is None:
        cat_path = os.path.join(input_path, "alias_catalog.parquet")
        catalog = pq.read_table(cat_path)

    os.makedirs(out_root, exist_ok=True)
    manifests = read_manifests(out_root)
    valid_parts: set[str] = set()
    skipped = ran = 0
    for f in files:
        part = _ipart_name(os.path.relpath(f, input_path))
        valid_parts.add(part)
        size = os.path.getsize(f)
        m = manifests.get(part, {})
        if is_complete(out_root, part) and m.get("inputs") == [f] \
                and m.get("input_bytes") == size:
            skipped += 1
            continue
        part_dir = os.path.join(out_root, "triples_raw", part)
        payload = run_phase_a([f], catalog, part_dir)
        payload.update({
            "phase": "A", "part": part, "input_bytes": size,
            "elapsed_s": round(time.monotonic() - t0, 2),
        })
        write_manifest(out_root, part, payload)
        ran += 1
        if verbose:
            print(f"[runner] {part}: {payload['rows']} rows (new/changed)")

    # prune partitions whose input file disappeared (only ipart-* — the
    # positional runner's part-* namespace is not ours to touch)
    raw_root = os.path.join(out_root, "triples_raw")
    removed = 0
    for leftover in sorted(os.listdir(raw_root)) if os.path.isdir(raw_root) else []:
        if leftover.startswith("ipart-") and leftover not in valid_parts:
            shutil.rmtree(os.path.join(raw_root, leftover))
            stale = manifest_path(out_root, leftover)
            if os.path.exists(stale):
                os.remove(stale)
            removed += 1

    parts = sorted(valid_parts)
    part_state = {p: read_manifests(out_root)[p].get("files_hash")
                  for p in parts}
    prior = read_manifests(out_root).get("final", {})
    if ran == 0 and removed == 0 and prior.get("mode") == "incremental" \
            and prior.get("part_state") == part_state \
            and os.path.isdir(os.path.join(out_root, "triples")):
        final = dict(prior)
        final.update({"shards_run": 0, "shards_skipped": skipped,
                      "phase_b": "skipped",
                      "elapsed_s": round(time.monotonic() - t0, 2)})
        return final

    final = _run_phase_b(out_root, parts, window_turns, chunk_turns,
                         t0, ran, skipped)
    final.update({"mode": "incremental", "part_state": part_state,
                  "shards_removed": removed, "phase_b": "ran"})
    write_manifest(out_root, "final", final)
    return final
