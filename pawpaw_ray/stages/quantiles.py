"""Exact distributed order statistics (quantiles / median) WITHOUT a
global sort: iterative range-binning selection.

A global ``ds.sort(col)`` moves the whole column through an all-to-all
exchange to answer a question whose output is k scalars.  This operator
instead finds the EXACT value at each target rank with a few counting
passes:

1. one map pass reduces every block to (count, min, max) partials — the
   driver gets n and the global value range;
2. each refinement pass counts rows per ``n_bins`` uniform value bins
   inside every still-active target interval (vectorized
   ``np.searchsorted`` per batch; the driver sums per-block count
   vectors — ``blocks x n_bins`` ints, never values);
3. a target whose bin holds more than ``gate_rows`` rows recurses into
   that bin (each pass narrows the candidate set by ~``n_bins``x, so
   10^12 rows need ~3 passes at the default 4096 bins);
4. one final filtered pass pulls only the candidate values inside the
   finalized intervals (bounded by ``gate_rows`` per target) and the
   driver selects by exact remaining rank.

Rank semantics: ``rank_q = ceil(q * n)`` (1-based over ascending order) —
the discrete lower quantile, the same expression the DuckDB oracle
evaluates (``row_number() = ceil(q*n)``), and the q*n product is one IEEE
double multiply so both engines pick the identical rank.

Each refinement pass re-executes the input's lineage: pass a file-backed
or materialized Dataset (the ``n_rows`` discipline of ``ann_topk_ivf``).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _batch_stats(b: pa.Table, col: str) -> pa.Table:
    x = b[col].to_numpy()
    x = x[~np.isnan(x)] if x.dtype.kind == "f" else x
    if not len(x):
        return pa.table({"n": pa.array([0], pa.int64()),
                         "lo": pa.array([np.nan], pa.float64()),
                         "hi": pa.array([np.nan], pa.float64())})
    return pa.table({"n": pa.array([len(x)], pa.int64()),
                     "lo": pa.array([float(x.min())], pa.float64()),
                     "hi": pa.array([float(x.max())], pa.float64())})


def exact_quantiles(ds, col: str, qs=(0.5, 0.9, 0.99),
                    n_bins: int = 4096, gate_rows: int = 2_000_000,
                    max_rounds: int = 8):
    """Exact values at ranks ``ceil(q*n)`` for each q in ``qs``.

    Returns a pyarrow Table ``(q, rank, value)`` sorted by q (k rows — a
    driver-side result by nature; the heavy work is the counting passes).
    NaNs are excluded from ranking (SQL ORDER BY treats them as NULLs do
    not exist in the fixtures).
    """
    import pandas as pd

    stats = (ds.map_batches(lambda b: _batch_stats(b, col),
                            batch_format="pyarrow").to_pandas())
    n = 0 if stats.empty else int(stats["n"].sum())
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "rank": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    glo, ghi = float(stats["lo"].min()), float(stats["hi"].max())

    # per-target state: remaining rank within the [lo, hi) interval
    # (top=True: right-closed — the global max rides the top interval)
    targets = []
    for q in qs:
        rank = int(math.ceil(q * n)) or 1
        targets.append({"q": float(q), "rank": rank, "rem": rank,
                        "lo": glo, "hi": ghi, "top": True, "count": n,
                        "value": None})

    def count_pass(intervals):
        """One map pass: per batch, per interval, counts per uniform bin
        (bins are [e_j, e_j+1), last bin right-closed only when the
        interval is the global top).  Returns the summed matrix."""
        edges_list = [np.linspace(lo, hi, n_bins + 1) for lo, hi, _ in intervals]

        def fn(b: pa.Table) -> pa.Table:
            x = b[col].to_numpy()
            x = x[~np.isnan(x)] if x.dtype.kind == "f" else x
            out = np.zeros((len(edges_list), n_bins), dtype=np.int64)
            for t, (edges, iv) in enumerate(zip(edges_list, intervals)):
                top = iv[2]
                sel = x[(x >= edges[0])
                        & ((x <= edges[-1]) if top else (x < edges[-1]))]
                if len(sel):
                    idx = np.clip(np.searchsorted(edges, sel, side="right") - 1,
                                  0, n_bins - 1)
                    out[t] = np.bincount(idx, minlength=n_bins)
            return pa.table({"t": pa.array(
                np.repeat(np.arange(len(edges_list)), n_bins), pa.int64()),
                "b": pa.array(np.tile(np.arange(n_bins), len(edges_list)),
                              pa.int64()),
                "c": pa.array(out.ravel(), pa.int64())})

        parts = (ds.map_batches(fn, batch_format="pyarrow").to_pandas()
                   .groupby(["t", "b"])["c"].sum())
        mat = np.zeros((len(intervals), n_bins), dtype=np.int64)
        for (t, b), c in parts.items():
            mat[t, b] = c
        return mat

    for _ in range(max_rounds):
        active = [t for t in targets
                  if t["value"] is None and t["count"] > gate_rows]
        if not active:
            break
        ivs = [(t["lo"], t["hi"], t["top"]) for t in active]
        mat = count_pass(ivs)
        for t, counts in zip(active, mat):
            edges = np.linspace(t["lo"], t["hi"], n_bins + 1)
            csum = np.cumsum(counts)
            b = int(np.searchsorted(csum, t["rem"], side="left"))
            below = int(csum[b - 1]) if b else 0
            t["rem"] -= below
            t["lo"], t["hi"] = float(edges[b]), float(edges[b + 1])
            t["top"] = t["top"] and (b == n_bins - 1)
            t["count"] = int(counts[b])
            if t["lo"] == t["hi"] or not np.isfinite(t["hi"] - t["lo"]):
                # degenerate bin: every candidate equals lo — found exactly
                t["value"] = t["lo"]

    # A 1-ulp-wide interval can hold millions of DUPLICATE values and will
    # never narrow further, yet it is exactly resolvable without any pull:
    # half-open [lo, nextafter(lo)) contains only lo; the right-closed top
    # interval contains only {lo, hi}, decided by one distributed count of
    # x == hi against the remaining rank.
    def count_eq(v: float) -> int:
        def fn(b: pa.Table) -> pa.Table:
            x = b[col].to_numpy()
            return pa.table({"c": pa.array([int((x == v).sum())], pa.int64())})
        return int(ds.map_batches(fn, batch_format="pyarrow")
                   .to_pandas()["c"].sum())

    for t in targets:
        if t["value"] is None and \
                np.nextafter(t["lo"], np.inf) >= t["hi"]:
            if not t["top"]:
                t["value"] = t["lo"]
            else:
                n_hi = count_eq(t["hi"])
                t["value"] = (t["lo"] if t["rem"] <= t["count"] - n_hi
                              else t["hi"])

    # final pull: candidate values per unresolved target (bounded by
    # gate_rows each — the refinement loop guarantees it unless
    # max_rounds was exhausted on a pathological distribution).  Check the
    # tracked interval counts BEFORE materializing anything: an
    # unconverged adversarial distribution must fail with the max_rounds
    # error, not a driver OOM from pulling a corpus-scale interval
    # (round-4 advice).
    pend = [t for t in targets if t["value"] is None]
    hard_cap = 8 * gate_rows
    for t in pend:
        if t["count"] > hard_cap:
            raise RuntimeError(
                f"quantile refinement did not converge for q={t['q']} "
                f"({t['count']} rows still in [{t['lo']}, {t['hi']}] after "
                f"{max_rounds} rounds, cap {hard_cap}); raise max_rounds "
                f"or n_bins")
    ivs = [(t["lo"], t["hi"], t["top"]) for t in pend]

    def pull(b: pa.Table) -> pa.Table:
        x = b[col].to_numpy()
        x = x[~np.isnan(x)] if x.dtype.kind == "f" else x
        ts, vs = [], []
        for i, (lo, hi, top) in enumerate(ivs):
            sel = x[(x >= lo) & ((x <= hi) if top else (x < hi))]
            ts.append(np.full(len(sel), i, dtype=np.int64))
            vs.append(sel.astype(np.float64))
        return pa.table({"t": pa.array(np.concatenate(ts), pa.int64()),
                         "v": pa.array(np.concatenate(vs), pa.float64())})

    if pend:
        cand = ds.map_batches(pull, batch_format="pyarrow").to_pandas()
        for i, t in enumerate(pend):
            v = np.sort(cand.loc[cand["t"] == i, "v"].to_numpy())
            if t["rem"] > len(v):
                raise RuntimeError(
                    f"quantile refinement did not converge for q={t['q']} "
                    f"(rem={t['rem']}, candidates={len(v)}); raise max_rounds")
            t["value"] = float(v[t["rem"] - 1])
    out_q = [t["q"] for t in targets]
    out_r = [t["rank"] for t in targets]
    out_v = [t["value"] for t in targets]
    order = np.argsort(out_q, kind="stable")
    return pa.table({"q": pa.array(np.array(out_q)[order], pa.float64()),
                     "rank": pa.array(np.array(out_r, dtype=np.int64)[order],
                                      pa.int64()),
                     "value": pa.array(np.array(out_v)[order], pa.float64())})


def grouped_quantiles(ds, key: str, col: str, qs: tuple = (0.25, 0.5, 0.9),
                      n_buckets: int | None = None):
    """Exact per-group quantiles: for every ``key`` group, the value at
    1-based ascending rank ``ceil(q * n_group)`` for each q (same rank
    semantics — and the same single IEEE ``q*n`` multiply — as
    :func:`exact_quantiles`, so a ``row_number() = ceil(q*n)`` SQL oracle
    replays it exactly).  NaNs excluded from ranking.

    Narrow shuffle: only ``(key, value)`` pairs cross the exchange, then
    each bucket resolves ALL its groups vectorized — one lexsort, segment
    boundaries, one gather per q; no per-group loop.  Contract: a single
    group's values must fit in one reduce task (the standard bucketed-
    groupby contract here); for corpus-scale single groups use the global
    iterative :func:`exact_quantiles` on the key's subset instead.

    Returns rows ``(key, q, rank, value)``.
    """
    import pandas as pd

    from pawpaw_ray.tuning import hash_bucket, shuffle_buckets
    n_buckets = n_buckets or shuffle_buckets(multiplier=1)
    qs = tuple(float(q) for q in qs)

    def narrow(b: pa.Table) -> pa.Table:
        t = pa.table({key: b[key], col: b[col]})
        return t.append_column(
            "qbucket", pa.array(hash_bucket(
                b[key].to_numpy(zero_copy_only=False), n_buckets),
                pa.int32()))

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        v = g[col].to_numpy(np.float64)
        k = g[key].to_numpy()
        ok = ~np.isnan(v)
        v, k = v[ok], k[ok]
        order = np.lexsort((v, k))
        ks, vs = k[order], v[order]
        n = len(ks)
        if not n:
            return pd.DataFrame({key: k[:0], "q": np.empty(0),
                                 "rank": np.empty(0, np.int64),
                                 "value": np.empty(0)})
        newseg = np.empty(n, dtype=bool)
        newseg[0] = True
        newseg[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(newseg)
        sizes = np.diff(np.append(starts, n))
        frames = []
        for q in qs:
            ranks = np.maximum(np.ceil(q * sizes), 1).astype(np.int64)
            frames.append(pd.DataFrame({
                key: ks[starts],
                "q": np.full(len(starts), q, np.float64),
                "rank": ranks,
                "value": vs[starts + ranks - 1],
            }))
        return pd.concat(frames, ignore_index=True)

    return (ds.map_batches(narrow, batch_format="pyarrow")
            .groupby("qbucket").map_groups(bucket_fn,
                                           batch_format="pandas"))
