"""Ordered-merge join operators over keyed event streams: as-of join and
interval (range) join — temporal joins a feature/training-data pipeline
needs that neither Ray Data nor the reference provides (the reference's
joins are span-tree adoption only; ``/root/reference/pawpaw/__init__.py``
``Ito.join`` operates within one document's span tree).

Both operators are ONE bucketed shuffle: each input stream is mapped to a
narrow uniform numeric schema ``(k, t0, t1, kind, rid, fv, jbucket)``,
unioned, hash-bucketed by join key, and resolved per bucket with a fully
vectorized merge — one lexsort over the combined rows, a cumulative count
of match-side rows, and per-key-segment bases.  No per-row, per-key, or
per-interval Python loop anywhere.

Semantics (fixed so a SQL oracle can replay them exactly):

* ``asof_join``: for each left row, the right row of the same key with the
  greatest ``ts_r <= ts_l`` (inclusive); ties on ``ts_r`` broken by the
  greatest right id.  INNER flavor — unmatched left rows are dropped, so
  the output carries no nulls (null int columns drift to float in both
  pandas and DuckDB result frames, poisoning hash comparison).
* ``interval_join``: for each interval ``[lo, hi]`` (both ends inclusive),
  the count of same-key points with ``lo <= ts <= hi`` plus the first and
  last point id in ``(ts, id)`` lexicographic order; zero-match intervals
  are dropped (same null-free rationale).

Partitioning assumption (documented per operator contract): co-location is
by join-KEY hash, so one pathological key owning a corpus-scale stream
concentrates in a single bucket.  The salting remedy used elsewhere in this
engine does NOT apply to ordered joins (a match may cross salt boundaries);
pre-split such keys upstream if the application can tolerate it.

Narrow-shuffle contract: only ``(key, two int64 times, one int64 id, one
float64 value)`` cross the all-to-all (~48 bytes/row) regardless of payload
width — wider payloads re-attach by id afterward with the existing
broadcast/hash-join stages (``stages/relational.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pawpaw_ray.tuning import hash_bucket, shuffle_buckets

_US = "datetime64[us]"


def _to_us(arr: np.ndarray) -> np.ndarray:
    """Timestamps (any datetime64 unit) or integers → int64 microseconds."""
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype(_US).astype(np.int64)
    return arr.astype(np.int64)


def _merge_ranks(key, t, side, w, rid):
    """Shared merge scaffold: sort rows by ``(key, t, side, rid)`` and count
    match-side rows.  Returns ``(order, c_before, base)``:

    * ``order``    — lexsort indices;
    * ``c_before`` — at each SORTED position, the number of ``w`` rows
      strictly before it in the global sorted order;
    * ``base``     — ``c_before`` at the start of the position's key
      segment (so ``c_before - base`` is the within-key rank).
    """
    order = np.lexsort((rid, side, t, key))
    ws = w[order].astype(np.int64)
    c_before = np.cumsum(ws) - ws
    ks = key[order]
    n = len(ks)
    newseg = np.empty(n, dtype=bool)
    if n:
        newseg[0] = True
        newseg[1:] = ks[1:] != ks[:-1]
    start = np.maximum.accumulate(np.where(newseg, np.arange(n), 0))
    return order, c_before, c_before[start]


def _narrow(k, t0, t1, kind, rid, fv, n_buckets) -> pd.DataFrame:
    return pd.DataFrame({
        "k": k.astype(np.int64),
        "t0": t0,
        "t1": t1,
        "kind": np.full(len(k), kind, np.int64),
        "rid": rid.astype(np.int64),
        "fv": fv,
        "jbucket": hash_bucket(k.astype(np.int64), n_buckets),
    })


def asof_join(left_ds, right_ds, key: str = "user_id", ts: str = "ts",
              left_id: str = "event_id", right_id: str = "event_id",
              right_value: str | None = None,
              out_cols: tuple = ("r_id", "r_ts", "r_value"),
              n_buckets: int | None = None, time_as_timestamp: bool = True):
    """INNER as-of join (module docstring): each left row picks the latest
    same-key right row at-or-before its timestamp.

    Output columns: ``(key, left_id, ts) + out_cols`` where ``out_cols``
    names the matched right id / right ts / right value (the value column
    is omitted when ``right_value`` is None).
    """
    n_buckets = n_buckets or shuffle_buckets()

    def left_batch(b: pa.Table) -> pd.DataFrame:
        n = b.num_rows
        return _narrow(b[key].to_numpy(), _to_us(b[ts].to_numpy()),
                       np.zeros(n, np.int64), 1, b[left_id].to_numpy(),
                       np.zeros(n, np.float64), n_buckets)

    def right_batch(b: pa.Table) -> pd.DataFrame:
        n = b.num_rows
        fv = (b[right_value].to_numpy().astype(np.float64)
              if right_value else np.zeros(n, np.float64))
        return _narrow(b[key].to_numpy(), _to_us(b[ts].to_numpy()),
                       np.zeros(n, np.int64), 0, b[right_id].to_numpy(),
                       fv, n_buckets)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(np.int64)
        t = g["t0"].to_numpy(np.int64)
        kind = g["kind"].to_numpy(np.int64)   # 0 = right, 1 = left
        rid = g["rid"].to_numpy(np.int64)
        # right rows sort before left rows at equal ts => inclusive <=
        order, c_before, base = _merge_ranks(k, t, kind, kind == 0, rid)
        ks, ts_s, kd, rs = k[order], t[order], kind[order], rid[order]
        is_r = kd == 0
        r_ids, r_ts = rs[is_r], ts_s[is_r]
        r_fv = g["fv"].to_numpy(np.float64)[order][is_r]
        ok = (kd == 1) & (c_before - base > 0)
        m = c_before[ok] - 1
        out = {key: ks[ok], left_id: rs[ok]}
        lt, rt = ts_s[ok], r_ts[m]
        if time_as_timestamp:
            lt, rt = lt.astype(_US), rt.astype(_US)
        out[ts] = lt
        out[out_cols[0]] = r_ids[m]
        out[out_cols[1]] = rt
        if right_value:
            out[out_cols[2]] = r_fv[m]
        return pd.DataFrame(out)

    both = (left_ds.map_batches(left_batch, batch_format="pyarrow")
            .union(right_ds.map_batches(right_batch, batch_format="pyarrow")))
    return both.groupby("jbucket").map_groups(resolve, batch_format="pandas")


def interval_join(intervals_ds, points_ds, key: str = "user_id",
                  lo: str = "lo", hi: str = "hi",
                  interval_id: str = "interval_id",
                  point_ts: str = "ts", point_id: str = "event_id",
                  out_cols: tuple = ("n_points", "first_id", "last_id"),
                  n_buckets: int | None = None):
    """Interval (range) join with aggregation (module docstring): per
    interval, the count of same-key points inside ``[lo, hi]`` plus the
    first/last point id in ``(ts, id)`` order.  Overlapping intervals each
    count their own points; cost is two probe rows per interval, NOT one
    output row per (interval, point) pair — at 100 TB the pair table is the
    thing you cannot afford to materialize.
    """
    n_buckets = n_buckets or shuffle_buckets()

    def points_batch(b: pa.Table) -> pd.DataFrame:
        tt = _to_us(b[point_ts].to_numpy())
        n = b.num_rows
        return _narrow(b[key].to_numpy(), tt, tt, 0, b[point_id].to_numpy(),
                       np.zeros(n, np.float64), n_buckets)

    def intervals_batch(b: pa.Table) -> pd.DataFrame:
        n = b.num_rows
        return _narrow(b[key].to_numpy(), _to_us(b[lo].to_numpy()),
                       _to_us(b[hi].to_numpy()), 1,
                       b[interval_id].to_numpy(),
                       np.zeros(n, np.float64), n_buckets)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        kind = g["kind"].to_numpy(np.int64)
        k = g["k"].to_numpy(np.int64)
        rid = g["rid"].to_numpy(np.int64)
        p, iv = kind == 0, kind == 1
        pk, pt, pid = k[p], g["t0"].to_numpy(np.int64)[p], rid[p]
        ik, ilo = k[iv], g["t0"].to_numpy(np.int64)[iv]
        ihi, iid = g["t1"].to_numpy(np.int64)[iv], rid[iv]
        n_iv = len(iid)
        # two probes per interval: lo-probe sorts BEFORE points at equal t
        # (inclusive lo), hi-probe AFTER (inclusive hi)
        K = np.concatenate([pk, ik, ik])
        T = np.concatenate([pt, ilo, ihi])
        S = np.concatenate([np.zeros(len(pk), np.int64),
                            np.full(n_iv, -1, np.int64),
                            np.full(n_iv, 1, np.int64)])
        R = np.concatenate([pid, iid, iid])
        probe = np.concatenate([np.full(len(pk), -1, np.int64),
                                np.arange(n_iv, dtype=np.int64),
                                np.arange(n_iv, dtype=np.int64)])
        order, c_before, _ = _merge_ranks(K, T, S, S == 0, R)
        ps, pr = S[order], probe[order]
        pts_ids = R[order][ps == 0]          # point ids in (key, ts, id) order
        c_lo = np.zeros(n_iv, np.int64)
        c_hi = np.zeros(n_iv, np.int64)
        c_lo[pr[ps == -1]] = c_before[ps == -1]
        c_hi[pr[ps == 1]] = c_before[ps == 1]
        # c_lo counts points before (key, lo); c_hi counts points up to
        # (key, hi) — SAME key for both probes, so the cross-key prefix
        # cancels in the difference and indexes stay inside the key segment
        n = c_hi - c_lo
        ok = n > 0
        return pd.DataFrame({
            interval_id: iid[ok],
            key: ik[ok],
            out_cols[0]: n[ok],
            out_cols[1]: pts_ids[c_lo[ok]],
            out_cols[2]: pts_ids[c_hi[ok] - 1],
        })

    both = (points_ds.map_batches(points_batch, batch_format="pyarrow")
            .union(intervals_ds.map_batches(intervals_batch,
                                            batch_format="pyarrow")))
    return both.groupby("jbucket").map_groups(resolve, batch_format="pandas")
