"""Ray Data execution tuning for this engine's workload shape.

Ray's default ``min_parallelism`` (200) makes every sort-shuffle produce 200
reduce partitions; our wide steps group on ≤64 hash buckets of compact
triple rows, so 200 partitions is pure per-task overhead (measured: 2-4x
slower shuffles at single-node scale).  Scale the shuffle parallelism to the
actual cluster instead.
"""

from __future__ import annotations


def tune_context(quiet: bool = True) -> None:
    import ray
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if quiet:
        ctx.enable_progress_bars = False
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        ncpu = 8
    ctx.min_parallelism = max(32, 2 * ncpu)


def read_blocks_for(ncpu: int | None = None) -> int:
    """Read-side block count for the KG chain: one task per CPU.

    Measured on the 200k-turn job at 32 CPUs: 32 blocks → 8.4 s, 64 → 13.2 s,
    128 → 27.6 s — per-block cost of the downstream sort shuffles dominates
    any occupancy gain from smaller tasks, so fewer/larger blocks win until
    a block no longer fits a worker's heap."""
    import ray

    if ncpu is None:
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            ncpu = 8
    return ncpu


def join_partitions(ncpu: int | None = None) -> int:
    """Partition count for ``Dataset.join``: each JoinOperator holds one
    aggregator ACTOR per partition, so cap by cluster CPUs or a small
    cluster cannot schedule the pool (two live 16-actor pools deadlocked a
    4-CPU box)."""
    import ray

    if ncpu is None:
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            ncpu = 8
    return min(shuffle_buckets(ncpu=ncpu), max(2, ncpu))


def shuffle_buckets(multiplier: int = 2, floor: int = 16,
                    cap: int = 4096, ncpu: int | None = None) -> int:
    """Shuffle fan-out for the bucketed-groupby pattern, derived from the
    cluster size instead of a hard-coded constant: ``multiplier x CPUs``
    balanced reduce partitions (clamped).  At 32 CPUs this reproduces the
    round-1 measured-optimal 64; on a 256-node cluster it scales the reduce
    parallelism instead of capping it."""
    import ray

    if ncpu is None:
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            ncpu = 8
    return min(cap, max(floor, multiplier * ncpu))


def hash_bucket(values, n_buckets: int):
    """Vectorized stable key bucketing mod ``n_buckets``, as int32.

    Strings: pandas' siphash over object arrays (library-fixed default key —
    deterministic across processes and runs).  Replaces per-row
    ``zlib.crc32`` generator loops in the wide-shuffle bucket assignments
    (measured ~10x per million rows).  Integer keys skip the object-array
    detour entirely: a wrapping splitmix64 finalizer over the raw uint64
    view (another ~10x — object hashing re-boxes every element).  The
    bucket function only partitions work, so any stable hash keeps results
    identical."""
    import numpy as np
    import pandas as pd

    a = np.asarray(values)
    if np.issubdtype(a.dtype, np.integer):
        z = a.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = z ^ (z >> np.uint64(31))
    else:
        h = pd.util.hash_array(np.asarray(a, dtype=object))
    return (h % np.uint64(n_buckets)).astype(np.int32)
