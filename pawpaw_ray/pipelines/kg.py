"""The flagship KG-construction pipeline, composed Ray-Data-first.

    read_parquet(transcripts)                        # pruned columns
      → map_batches(segment_sentences_batch)        # sentence spans (Arrow)
      → map_batches(triples_batch)                  # SVO candidate rows
      → map_batches(link_triples)                   # broadcast alias index
      → resolve_coref(salt_chunks=True,             # salted conv shuffle;
                      add_keys=True)                #  canonical keys fused in
      → dedup_triples(...) + build_entity_table(...)  # the two wide shuffles
                                                       # (consume concurrently)

The extraction chain streams into the coref shuffle's internal
materialization (the salted path pins the compact triple rows once — the
raw text never crosses a shuffle); dedup and the entity aggregation both
read that one materialized table, so callers should consume the two
returned Datasets concurrently (see bench.py) to overlap their shuffles.
"""

from __future__ import annotations

import pyarrow as pa

from pawpaw_ray.stages.canonicalize import (
    build_entity_table,
    canonical_keys_batch,
    dedup_triples,
)
from pawpaw_ray.stages.coref import resolve_coref
from pawpaw_ray.stages.link import TripleLinker, make_triple_linker_fn
from pawpaw_ray.stages.segment import segment_sentences_batch
from pawpaw_ray.stages.triples import triples_batch


def extract_linked_triples(
    transcripts_ds,
    catalog: pa.Table,
    linker_concurrency=None,
    batch_size: int | None = None,
):
    """transcripts → linked candidate triples (streaming, no shuffle).

    The linker runs as STATELESS tasks with a per-worker-process cached
    alias index (broadcast via ``ray.put`` once): the whole fused
    segment→extract→link chain is then an elastic task pool that scales to
    every free CPU immediately.  (An actor pool gives the same state
    amortization but pays pool ramp-up — measured 2x slower end-to-end on
    short jobs; pass ``linker_concurrency`` to force the actor-pool variant
    when the linker state is too heavy for every worker process.)
    """
    import ray

    catalog_ref = ray.put(catalog)
    # batch_size=None → one batch per input block: task granularity (and so
    # occupancy/straggler behavior) is controlled at the READ via
    # override_num_blocks, not by re-bundling here.  Sentence-level
    # segmentation only — SVO extraction never looks below sentences.
    base = (
        transcripts_ds
        .map_batches(segment_sentences_batch, batch_format="pyarrow",
                     batch_size=batch_size)
        .map_batches(triples_batch, batch_format="pyarrow", batch_size=batch_size)
    )
    if linker_concurrency is not None:
        return base.map_batches(
            TripleLinker,
            fn_constructor_args=(catalog_ref,),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=linker_concurrency,
        )
    return base.map_batches(
        make_triple_linker_fn(catalog_ref),
        batch_format="pyarrow", batch_size=batch_size)


def build_kg(
    transcripts_ds,
    catalog: pa.Table,
    window_turns: int = 8,
    chunk_turns: int = 512,
    coref: bool = True,
    linker_concurrency=None,
    batch_size: int | None = None,
    salt_chunks: bool = True,
):
    """Full pipeline; returns dict of Datasets:
    ``triples`` (canonical, deduped, with lineage count), ``entities``.

    ``salt_chunks`` defaults on: the coref shuffle keys on salted
    ``(conv_id, turn_idx // chunk_turns)`` so a mega-conversation (the
    fixture's holds 20% of all turns) becomes many bounded groups instead of
    one straggler task that serializes the whole stage."""
    linked = extract_linked_triples(
        transcripts_ds, catalog, linker_concurrency, batch_size)
    if coref and not salt_chunks:
        # Pipeline-break before the sort shuffle: an AllToAll op buffers its
        # whole input in the object store anyway, and the streaming
        # executor's per-operator resource reservation otherwise starves the
        # CPU-bound extraction chain (~50% of cores; measured 2x wall time
        # at 8 CPUs).  Object-store spilling keeps this scale-safe.  (The
        # salted path materializes internally — the same barrier.)
        linked = linked.materialize()

    if coref:
        # resolve + canonical keys fused into one shuffle pass
        keyed = resolve_coref(linked, window_turns, chunk_turns,
                              salt_chunks=salt_chunks, add_keys=True)
    else:
        def no_coref(b: pa.Table) -> pa.Table:
            return b.append_column(
                "via_coref", pa.array([False] * len(b), pa.bool_()))
        keyed = (linked.map_batches(no_coref, batch_format="pyarrow")
                 .map_batches(canonical_keys_batch, batch_format="pyarrow"))

    # the two consumers below each traverse `keyed`; pin the compact triple
    # rows once so segmentation/extraction doesn't run twice
    keyed = keyed.materialize()

    return {
        "triples": dedup_triples(keyed),
        "entities": build_entity_table(keyed),
    }
