"""Ordered-stream operators over an events table: tumbling-window aggregates
(map-side combine → small groupby) and per-key ordered stats (first/last by
timestamp) — the engine's window/ordering primitives outside conversations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pawpaw_ray.tuning import shuffle_buckets


def window_partials_batch(batch: pa.Table, window_s: int = 3600) -> pa.Table:
    """Per-batch partial tumbling-window aggregation: (user_id, win) →
    n / min_value / max_value.  The groupby downstream merges partials, so
    the shuffle moves one row per (user, window) per batch."""
    df = pd.DataFrame({
        "user_id": batch["user_id"].to_numpy(),
        "win": (batch["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
                // window_s).astype(np.int64),
        "value": batch["value"].to_numpy(),
    })
    agg = (df.groupby(["user_id", "win"], sort=False)["value"]
           .agg(n="size", min_value="min", max_value="max").reset_index())
    agg["n"] = agg["n"].astype(np.int64)
    return pa.Table.from_pandas(agg, preserve_index=False)


def window_merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
    out = (g.groupby(["user_id", "win"], sort=False)
           .agg(n=("n", "sum"), min_value=("min_value", "min"),
                max_value=("max_value", "max")).reset_index())
    out["n"] = out["n"].astype(np.int64)
    return out


def tumbling_window(events_ds, window_s: int = 3600, n_buckets: int | None = None):
    """(user_id, win, n, min_value, max_value) via partial+final aggregation."""
    n_buckets = n_buckets or shuffle_buckets(multiplier=1)
    partials = events_ds.map_batches(
        lambda b: window_partials_batch(b, window_s), batch_format="pyarrow")

    def add_bucket(b: pa.Table) -> pa.Table:
        buck = (b["user_id"].to_numpy() % n_buckets).astype(np.int32)
        return b.append_column("wbucket", pa.array(buck, pa.int32()))

    # (the merge fn's output already omits the bucket column)
    return (partials.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("wbucket")
            .map_groups(window_merge_bucket, batch_format="pandas"))


def user_ordered_stats_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Per user: event count + first/last event_type in (ts, event_id)
    order (deterministic tiebreak)."""
    g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    grp = g.groupby("user_id", sort=False)
    first = grp.head(1).set_index("user_id")["event_type"]
    last = grp.tail(1).set_index("user_id")["event_type"]
    n = grp.size()
    return pd.DataFrame({
        "user_id": n.index.to_numpy(np.int64),
        "n_events": n.to_numpy(np.int64),
        "first_type": first.reindex(n.index).to_numpy(object),
        "last_type": last.reindex(n.index).to_numpy(object),
    })


def sessionize_bucket(g: pd.DataFrame, gap_s: int) -> pd.DataFrame:
    """Gap-based sessionization of one user-hash bucket: a new session
    starts when the inter-event gap exceeds ``gap_s``.  Vectorized: session
    ids are a cumulative sum over gap markers within each user."""
    g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ts = g["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
    uid = g["user_id"].to_numpy()
    new_user = np.empty(len(g), dtype=bool)
    new_user[0:1] = True
    new_user[1:] = uid[1:] != uid[:-1]
    gap = np.empty(len(g), dtype=bool)
    gap[0:1] = True
    gap[1:] = (ts[1:] - ts[:-1]) > gap_s
    marker = (new_user | gap).astype(np.int64)
    sess_global = np.cumsum(marker) - 1
    # per-user session index (0-based)
    first_sess_of_user = pd.Series(sess_global).groupby(uid).transform("min").to_numpy()
    g["session_idx"] = (sess_global - first_sess_of_user).astype(np.int64)
    out = (g.groupby(["user_id", "session_idx"], sort=False)
           .agg(n_events=("event_id", "size"),
                start_ts=("ts", "min"), end_ts=("ts", "max"))
           .reset_index())
    out["n_events"] = out["n_events"].astype(np.int64)
    return out


def sessionize(events_ds, gap_s: int = 1800, n_buckets: int | None = None):
    n_buckets = n_buckets or shuffle_buckets(multiplier=1)
    """(user_id, session_idx, n_events, start_ts, end_ts) — the windowed
    sessionization a training-data pipeline uses to segment event streams;
    one bucketed shuffle, per-bucket vectorized scan."""
    def add_bucket(b: pa.Table) -> pa.Table:
        buck = (b["user_id"].to_numpy() % n_buckets).astype(np.int32)
        return b.append_column("sbucket", pa.array(buck, pa.int32()))

    return (events_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("sbucket")
            .map_groups(lambda g: sessionize_bucket(g, gap_s),
                        batch_format="pandas"))


def lag_features_bucket(g: pd.DataFrame,
                        keep_cols: tuple = ()) -> pd.DataFrame:
    """Per-event previous-event features within one user-hash bucket:
    microsecond gap since the user's previous event and that event's type,
    in (ts, event_id) order.  First event per user: gap = -1 (a real gap is
    always >= 0 once sorted), prev_type = '' — sentinel values rather than
    nulls, so the int64/str dtypes survive both pandas and the SQL oracle
    without nullable-column drift."""
    g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    uid = g["user_id"].to_numpy()
    gap = np.full(len(g), -1, np.int64)
    prev_type = np.full(len(g), "", object)
    if len(g) > 1:
        same = uid[1:] == uid[:-1]
        gap[1:][same] = (ts[1:] - ts[:-1])[same]
        prev_type[1:][same] = g["event_type"].to_numpy(object)[:-1][same]
    out = pd.DataFrame({
        "event_id": g["event_id"].to_numpy(np.int64),
        "user_id": uid.astype(np.int64),
        "prev_gap_us": gap,
        "prev_type": prev_type,
    })
    for c in keep_cols:        # current-row columns, in sorted order
        out[c] = g[c].to_numpy()
    return out


def lag_features(events_ds, n_buckets: int | None = None,
                 keep_cols: tuple = ()):
    """(event_id, user_id, prev_gap_us, prev_type [, keep_cols...]) — the
    per-key ordered lag/window primitive (SQL LAG ... OVER (PARTITION BY
    user ORDER BY ts)); one bucketed shuffle, per-bucket vectorized
    shift.  ``keep_cols`` pass current-row columns through so downstream
    composition (e.g. transition counting) needs no re-join by id."""
    n_buckets = n_buckets or shuffle_buckets(multiplier=1)

    def add_bucket(b: pa.Table) -> pa.Table:
        buck = (b["user_id"].to_numpy() % n_buckets).astype(np.int32)
        return b.append_column("lbucket", pa.array(buck, pa.int32()))

    return (events_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("lbucket")
            .map_groups(lambda g: lag_features_bucket(g, keep_cols),
                        batch_format="pandas"))


def hopping_window(events_ds, window_s: int = 21_600, hop_s: int = 3_600,
                   n_buckets: int | None = None):
    """Hopping (sliding) window aggregates: every event lands in the
    ``window_s / hop_s`` overlapping windows ``[s, s + window_s)`` whose
    start ``s`` is a multiple of ``hop_s`` — (user_id, win_start, n,
    sum_cents) per window.  ``window_s`` must be a multiple of ``hop_s``.

    Map-side: each batch replicates rows into their windows VECTORIZED
    (one ``np.repeat`` + tiled hop index, no per-row loop) and partially
    aggregates, so the shuffle moves one row per (user, window) per batch
    — the replication factor never reaches the exchange.  Value sums in
    integer cents (exact across engines, same rationale as
    :func:`rolling_window_bucket`).
    """
    if window_s % hop_s:
        raise ValueError("window_s must be a multiple of hop_s")
    m = window_s // hop_s
    hop_us = hop_s * 1_000_000
    n_buckets = n_buckets or shuffle_buckets(multiplier=1)

    def partials(b: pa.Table) -> pa.Table:
        t = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        base = t // hop_us
        n = len(t)
        k = np.tile(np.arange(m, dtype=np.int64), n)
        df = pd.DataFrame({
            "user_id": np.repeat(b["user_id"].to_numpy(), m),
            "win_start": (np.repeat(base, m) - k) * np.int64(hop_s),
            "cents": np.repeat(
                np.rint(b["value"].to_numpy() * 100).astype(np.int64), m),
        })
        agg = (df.groupby(["user_id", "win_start"], sort=False)["cents"]
               .agg(n="size", sum_cents="sum").reset_index())
        agg["n"] = agg["n"].astype(np.int64)
        agg["hbucket"] = (agg["user_id"].to_numpy()
                          % n_buckets).astype(np.int32)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["user_id", "win_start"], sort=False)
               .agg(n=("n", "sum"), sum_cents=("sum_cents", "sum"))
               .reset_index())
        return out.astype("int64")

    return (events_ds.map_batches(partials, batch_format="pyarrow")
            .groupby("hbucket").map_groups(merge, batch_format="pandas"))


def funnel_bucket(g: pd.DataFrame, steps: tuple) -> pd.DataFrame:
    """Per-bucket ordered-funnel resolution: for each user, the earliest
    timestamp of step i at-or-after the user's resolved step-(i-1) time
    (``t_i = min ts where type = steps[i] and ts >= t_{i-1}``, inclusive so
    a same-microsecond next step counts).  INNER: users that never complete
    every step are dropped (null timestamps drift to NaT/None and poison
    engine-exact comparison).

    Vectorized per step: one masked where + ``np.minimum.reduceat`` over
    the user segment boundaries — k steps = k linear passes, no per-user
    loop."""
    g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    uid = g["user_id"].to_numpy()
    et = g["event_type"].to_numpy(object)
    n = len(g)
    newseg = np.empty(n, dtype=bool)
    newseg[0] = True
    newseg[1:] = uid[1:] != uid[:-1]
    starts = np.flatnonzero(newseg)
    seg = np.cumsum(newseg) - 1
    big = np.iinfo(np.int64).max
    prev = np.full(len(starts), np.iinfo(np.int64).min)   # t_0 = -inf
    out_ts = []
    for s in steps:
        cand = np.where((et == s) & (ts >= prev[seg]), ts, big)
        t_i = np.minimum.reduceat(cand, starts)
        out_ts.append(t_i)
        prev = t_i                                  # big propagates: once a
        # step is missing every later step's ts >= big comparison fails
    done = out_ts[-1] != big
    out = {"user_id": uid[starts][done].astype(np.int64)}
    for s, t_i in zip(steps, out_ts):
        out[f"ts_{s}"] = t_i[done].astype("datetime64[us]")
    return pd.DataFrame(out)


def funnel(events_ds, steps: tuple = ("view", "click", "purchase"),
           n_buckets: int | None = None):
    """Ordered conversion funnel: per user, the earliest chain of ``steps``
    timestamps where each step occurs at-or-after the previous resolved
    step; only fully-converted users are emitted.  One bucketed shuffle of
    ``(user_id, ts, event_id, event_type)``; per-bucket vectorized
    resolution (``funnel_bucket``)."""
    n_buckets = n_buckets or shuffle_buckets(multiplier=1)

    def add_bucket(b: pa.Table) -> pa.Table:
        buck = (b["user_id"].to_numpy() % n_buckets).astype(np.int32)
        return b.append_column("fbucket", pa.array(buck, pa.int32()))

    return (events_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("fbucket")
            .map_groups(lambda g: funnel_bucket(g, tuple(steps)),
                        batch_format="pandas"))


def group_mode(ds, key: str, col: str, n_buckets: int | None = None):
    """Per-key mode of ``col`` (most frequent value; ties resolved to the
    lexicographically smallest value — deterministic and SQL-replayable
    via ``row_number() OVER (ORDER BY n DESC, value)``), with its count.

    Two-level aggregation: per-batch (key, value) counts shrink the
    exchange to one row per distinct pair per batch; the bucketed merge
    re-sums and takes each key's winner with one vectorized sort + grouped
    head — no per-key loop.
    """
    from pawpaw_ray.tuning import hash_bucket
    n_buckets = n_buckets or shuffle_buckets(multiplier=1)

    def partials(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({key: b[key].to_numpy(zero_copy_only=False),
                           col: b[col].to_numpy(zero_copy_only=False)})
        agg = (df.groupby([key, col], sort=False)
               .size().rename("n").reset_index())
        agg["n"] = agg["n"].astype(np.int64)
        agg["mbucket"] = hash_bucket(agg[key].to_numpy(), n_buckets)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c = (g.groupby([key, col], sort=False)["n"].sum().reset_index())
        c = c.sort_values([key, "n", col], ascending=[True, False, True],
                          kind="mergesort")
        return c.groupby(key, sort=False).head(1).reset_index(drop=True)

    return (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("mbucket").map_groups(merge, batch_format="pandas"))


def rolling_window_bucket(g: pd.DataFrame, window_us: int) -> pd.DataFrame:
    """Per-bucket trailing-window aggregates: for every event, the count and
    integer-cents value sum of the SAME user's events with ``ts`` in
    ``[ts_i - W, ts_i]`` — SQL ``RANGE BETWEEN <W> PRECEDING AND CURRENT
    ROW`` semantics, peers (tied ``ts``) included on both sides.

    Fully vectorized: one sort, then every per-row window is found with two
    ``np.searchsorted`` calls over a strictly-ordered adjusted time axis —
    per-user segments rebased to 0 and separated by ``max_span + W + 1``
    gaps, so a trailing-window probe can never cross into the previous
    user's segment.  Sums come from one cumulative-sum array (integer
    cents, so Ray and the SQL oracle agree bit-for-bit regardless of
    accumulation order — double windowed sums tie-break differently
    between numpy cumsum and DuckDB's segment tree).
    """
    g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    uid = g["user_id"].to_numpy()
    n = len(g)
    newseg = np.empty(n, dtype=bool)
    newseg[0] = True
    newseg[1:] = uid[1:] != uid[:-1]
    seg = np.cumsum(newseg) - 1
    base = ts[newseg][seg]                       # per-row segment min ts
    rel = ts - base
    span = int(rel.max()) if n else 0
    step = span + window_us + 1
    n_segs = int(seg[-1]) + 1 if n else 0
    if n_segs * step >= 1 << 62:
        raise RuntimeError(
            "rolling_window: adjusted time axis would overflow int64 "
            f"({n_segs} keys x {step} us step in one bucket); raise "
            "n_buckets so fewer keys share a bucket")
    adj = rel + seg * step
    lo = np.searchsorted(adj, adj - window_us, side="left")
    hi = np.searchsorted(adj, adj, side="right")
    cents = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
    cs = np.concatenate([np.zeros(1, np.int64), np.cumsum(cents)])
    return pd.DataFrame({
        "event_id": g["event_id"].to_numpy(np.int64),
        "user_id": uid.astype(np.int64),
        "w_n": (hi - lo).astype(np.int64),
        "w_sum_cents": cs[hi] - cs[lo],
    })


def rolling_window(events_ds, window_s: int = 604_800,
                   n_buckets: int | None = None):
    """(event_id, user_id, w_n, w_sum_cents) — trailing-window count + sum
    per event over the user's prior ``window_s`` seconds (default 7 days);
    one bucketed shuffle, per-bucket two-searchsorted resolution."""
    n_buckets = n_buckets or shuffle_buckets(multiplier=1)
    window_us = window_s * 1_000_000

    def add_bucket(b: pa.Table) -> pa.Table:
        buck = (b["user_id"].to_numpy() % n_buckets).astype(np.int32)
        return b.append_column("rbucket", pa.array(buck, pa.int32()))

    return (events_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("rbucket")
            .map_groups(lambda g: rolling_window_bucket(g, window_us),
                        batch_format="pandas"))


def user_ordered_stats(events_ds, n_buckets: int | None = None):
    n_buckets = n_buckets or shuffle_buckets(multiplier=1)
    def add_bucket(b: pa.Table) -> pa.Table:
        buck = (b["user_id"].to_numpy() % n_buckets).astype(np.int32)
        return b.append_column("ubucket", pa.array(buck, pa.int32()))

    return (events_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("ubucket")
            .map_groups(user_ordered_stats_bucket, batch_format="pandas"))
