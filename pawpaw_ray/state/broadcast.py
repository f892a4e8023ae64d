"""Per-worker-process cache for ``ray.put`` broadcast objects.

The broadcast pattern this engine uses everywhere — ``ray.put`` a small
lookup structure once on the driver, read it inside ``map_batches`` tasks —
must NOT call ``ray.get`` per batch: that deserializes the whole object on
every call (a per-batch pickle storm at real dimension-table cardinality).
``cached_get`` amortizes it to once per worker process, the same cost an
actor-pool ``__init__`` would pay (see ``stages/link.py`` for the
index-building variant of the same idiom).
"""

from __future__ import annotations

_CACHE: dict[str, object] = {}


def cached_get(ref):
    """``ray.get(ref)`` memoized per worker process (single-slot cache: one
    broadcast object per stage per process is the common case)."""
    if not hasattr(ref, "hex"):  # plain object in unit tests
        return ref
    import ray

    key = ref.hex()
    if key not in _CACHE:
        val = ray.get(ref)
        _CACHE.clear()
        _CACHE[key] = val
    return _CACHE[key]
