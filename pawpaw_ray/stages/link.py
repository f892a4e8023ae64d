"""Entity linking — the stateful actor-pool stage.

Re-expresses the reference's alias-dictionary entity discovery
(``Ontology.discover``, ``/root/reference/pawpaw/ontology/ontology.py:60-70``:
run every alias rule of every ontology node over the text, collect matches
per dotted path) as a Ray actor pool: the alias dictionary is ``ray.put``
ONCE on the driver, each actor fetches it ONCE in ``__init__`` (never per
batch), compiles a single ``\\L<aliases>``-style scan pattern, and links
mentions per batch.

Two consumers:
  * :class:`MentionScanner` — scan the full turn text, emit mention rows
    ``(conv_id, turn_idx, start, stop, surface, entity_id, entity_path,
    ambiguous)``.
  * :class:`TripleLinker` — dictionary-lookup linking of triple subject /
    object surfaces (exact, casefolded), appending ``subj_id``/``obj_id``/
    ``subj_path``/``obj_path`` columns.

Ambiguous aliases (one surface → several entities) resolve deterministically
to the lowest ``entity_id`` and are flagged; context-sensitive resolution
happens downstream in the coreference window.
"""

from __future__ import annotations

import pyarrow as pa
import regex as rx


class AliasIndex:
    """Casefolded alias → [(entity_id, entity_path, canonical)] plus a
    word-boundary scan pattern over all aliases (longest-alternative-first,
    which the ``regex`` named-list implementation guarantees)."""

    def __init__(self, catalog: pa.Table):
        self.by_alias: dict[str, list[tuple[str, str, str]]] = {}
        ids = catalog["entity_id"].to_pylist()
        paths = catalog["entity_path"].to_pylist()
        canon = catalog["canonical"].to_pylist()
        aliases = catalog["aliases"].to_pylist()
        surfaces: set[str] = set()
        for eid, path, can, al in zip(ids, paths, canon, aliases):
            for a in al:
                self.by_alias.setdefault(a.casefold(), []).append((eid, path, can))
                surfaces.add(a)
        for v in self.by_alias.values():
            v.sort()
        self.pattern = rx.compile(
            r"(?<!\w)(?:\L<surfaces>)(?!\w)", surfaces=sorted(surfaces),
        )

    def lookup(self, surface: str) -> tuple[str | None, str | None, str | None, bool]:
        """(entity_id, entity_path, canonical, ambiguous) for an exact
        surface form."""
        hits = self.by_alias.get(surface.strip().casefold())
        if not hits:
            return None, None, None, False
        return hits[0][0], hits[0][1], hits[0][2], len(hits) > 1


MENTION_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("start", pa.int32()),
    ("stop", pa.int32()),
    ("surface", pa.string()),
    ("entity_id", pa.string()),
    ("entity_path", pa.string()),
    ("ambiguous", pa.bool_()),
])


class MentionScanner:
    """Actor-pool callable: scan turn text for alias mentions.

    ``catalog_ref`` is a ``ray.ObjectRef`` to the catalog Arrow table (or the
    table itself in unit tests); the index build + pattern compile happen
    once per actor.
    """

    def __init__(self, catalog_ref):
        catalog = _resolve_ref(catalog_ref)
        self.index = AliasIndex(catalog)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        conv = batch["conv_id"].to_pylist()
        tidx = batch["turn_idx"].to_pylist()
        cols = {name: [] for name in MENTION_SCHEMA.names}
        for i, text in enumerate(texts):
            for m in self.index.pattern.finditer(text):
                surface = m.group(0)
                eid, path, _can, amb = self.index.lookup(surface)
                cols["conv_id"].append(conv[i])
                cols["turn_idx"].append(tidx[i])
                cols["start"].append(m.start())
                cols["stop"].append(m.end())
                cols["surface"].append(surface)
                cols["entity_id"].append(eid)
                cols["entity_path"].append(path)
                cols["ambiguous"].append(amb)
        return pa.table(
            {n: pa.array(cols[n], MENTION_SCHEMA.field(n).type) for n in MENTION_SCHEMA.names},
            schema=MENTION_SCHEMA,
        )


class TripleLinker:
    """Actor-pool callable: link triple subj/obj surfaces against the alias
    dictionary (exact casefolded lookup — a broadcast hash join on the small
    side, no shuffle)."""

    def __init__(self, catalog_ref):
        self.index = AliasIndex(_resolve_ref(catalog_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        return link_columns(batch, self.index)


def _resolve_ref(ref):
    try:
        import ray
        if isinstance(ref, ray.ObjectRef):
            return ray.get(ref)
    except ImportError:
        pass
    return ref


# per-worker-process AliasIndex cache for the stateless-task variant: the
# index is built once per process (same amortization as an actor __init__)
# but the stage runs as an elastic task pool — no actor-pool ramp-up, which
# dominates short jobs and bursty autoscaling
_INDEX_CACHE: dict[str, AliasIndex] = {}


def _cached_index(catalog_ref) -> AliasIndex:
    key = catalog_ref.hex() if hasattr(catalog_ref, "hex") else str(id(catalog_ref))
    idx = _INDEX_CACHE.get(key)
    if idx is None:
        idx = AliasIndex(_resolve_ref(catalog_ref))
        _INDEX_CACHE.clear()  # one catalog per process is the common case
        _INDEX_CACHE[key] = idx
    return idx


def link_columns(batch: pa.Table, index: AliasIndex) -> pa.Table:
    """Link subj/obj columns via per-UNIQUE-surface lookup: surfaces repeat
    heavily (thousands of mentions per entity), so dictionary-encode each
    column, resolve each distinct surface once, and gather by code."""
    t = batch
    for side in ("subj", "obj"):
        col = batch[side]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = col.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        hits = [index.lookup(s) for s in uniq]
        idx = enc.indices
        t = (t.append_column(f"{side}_id", pa.array(
                [h[0] for h in hits], pa.string()).take(idx))
              .append_column(f"{side}_path", pa.array(
                [h[1] for h in hits], pa.string()).take(idx))
              .append_column(f"{side}_canonical", pa.array(
                [h[2] for h in hits], pa.string()).take(idx)))
    return t


def make_triple_linker_fn(catalog_ref):
    """Stateless map_batches fn version of :class:`TripleLinker` (broadcast
    ref + process-cached index)."""

    def link_triples(batch: pa.Table) -> pa.Table:
        return link_columns(batch, _cached_index(catalog_ref))

    return link_triples
