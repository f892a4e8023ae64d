"""Ordered-merge temporal joins (stages/joins.py) and the per-key lag
window (stages/events.py lag_features): differential tests against
brute-force pandas/numpy references on adversarial fixtures — timestamp
ties, boundary-inclusive interval ends, zero-match rows, a hot key owning
most of the stream, and keys that never match across sides.
"""

import numpy as np
import pandas as pd
import pytest


def _rand_events(rng, n, n_users, t_span=10_000):
    """Synthetic keyed event stream with DELIBERATE ts collisions (small
    integer time domain) so tie-breaking rules are actually exercised."""
    return pd.DataFrame({
        "user_id": rng.integers(0, n_users, n).astype(np.int64),
        "ts": rng.integers(0, t_span, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "value": np.round(rng.uniform(0, 100, n), 2),
    })


def _brute_asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, l in left.iterrows():
        m = right[(right.user_id == l.user_id) & (right.ts <= l.ts)]
        if len(m) == 0:
            continue
        r = m.sort_values(["ts", "event_id"]).iloc[-1]
        rows.append((l.user_id, l.event_id, l.ts,
                     r.event_id, r.ts, r.value))
    return pd.DataFrame(rows, columns=["user_id", "event_id", "ts",
                                       "r_id", "r_ts", "r_value"])


def _brute_interval(iv: pd.DataFrame, pts: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, r in iv.iterrows():
        m = pts[(pts.user_id == r.user_id)
                & (pts.ts >= r.lo) & (pts.ts <= r.hi)]
        if len(m) == 0:
            continue
        m = m.sort_values(["ts", "event_id"])
        rows.append((r.interval_id, r.user_id, len(m),
                     m.event_id.iloc[0], m.event_id.iloc[-1]))
    return pd.DataFrame(rows, columns=["interval_id", "user_id",
                                       "n_points", "first_id", "last_id"])


def _sorted(df, cols):
    return (df.sort_values(cols, kind="mergesort")
            .reset_index(drop=True).astype("int64", errors="ignore"))


@pytest.mark.parametrize("n_users", [3, 40])
def test_asof_join_differential(ray_session, n_users):
    import ray.data as rd

    from pawpaw_ray.stages.joins import asof_join

    rng = np.random.default_rng(7)
    left = _rand_events(rng, 400, n_users)
    right = _rand_events(rng, 400, n_users)
    right["event_id"] += 10_000
    # a hot key owning a big slice of both sides
    left.loc[:120, "user_id"] = 0
    right.loc[:120, "user_id"] = 0
    # a left-only key (never matches) and duplicated right (ts, user) pairs
    left.loc[121:140, "user_id"] = n_users + 5
    right = pd.concat(
        [right, right.iloc[:30].assign(event_id=lambda d: d.event_id + 555)],
        ignore_index=True)

    got = asof_join(
        rd.from_pandas(left[["user_id", "ts", "event_id"]]),
        rd.from_pandas(right),
        right_value="value", n_buckets=5,
        time_as_timestamp=False).to_pandas()
    want = _brute_asof(left, right)

    key = ["user_id", "event_id"]
    got, want = _sorted(got, key), _sorted(want, key)
    assert len(got) == len(want)
    for c in ["user_id", "event_id", "ts", "r_id", "r_ts"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert np.allclose(got.r_value.to_numpy(), want.r_value.to_numpy())


def test_asof_tie_breaks_to_greatest_right_id(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.joins import asof_join

    left = pd.DataFrame({"user_id": [1, 1], "ts": [100, 50],
                         "event_id": [1, 2]})
    # two right rows at EXACTLY ts=100 (inclusive <=, greatest id wins);
    # nothing at-or-before ts=50 => left row 2 dropped (INNER)
    right = pd.DataFrame({"user_id": [1, 1, 1], "ts": [100, 100, 101],
                          "event_id": [7, 9, 11],
                          "value": [1.0, 2.0, 3.0]})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    right_value="value", n_buckets=2,
                    time_as_timestamp=False).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.event_id, row.r_id, row.r_ts, row.r_value) == (1, 9, 100, 2.0)


def test_asof_no_value_column_and_timestamp_output(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.joins import asof_join

    left = pd.DataFrame({
        "user_id": [1, 1], "event_id": [1, 2],
        "ts": pd.to_datetime([100, 200], unit="s").astype("datetime64[us]")})
    right = pd.DataFrame({
        "user_id": [1], "event_id": [7],
        "ts": pd.to_datetime([150], unit="s").astype("datetime64[us]")})
    out = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                     n_buckets=2).to_pandas())
    # right_value=None => no r_value column; timestamps come back as such
    assert list(out.columns) == ["user_id", "event_id", "ts", "r_id", "r_ts"]
    assert len(out) == 1 and out.event_id.item() == 2
    assert out.ts.dtype.kind == "M" and out.r_ts.dtype.kind == "M"
    assert out.r_ts.item() == pd.Timestamp("1970-01-01 00:02:30")


def test_interval_join_differential(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.joins import interval_join

    rng = np.random.default_rng(11)
    pts = _rand_events(rng, 500, 20)
    n_iv = 120
    lo = rng.integers(0, 9_000, n_iv).astype(np.int64)
    iv = pd.DataFrame({
        "interval_id": np.arange(n_iv, dtype=np.int64),
        "user_id": rng.integers(0, 24, n_iv).astype(np.int64),  # some keys point-free
        "lo": lo,
        "hi": lo + rng.integers(0, 2_000, n_iv).astype(np.int64),
    })
    # force boundary hits: intervals 0/1 start/end EXACTLY on a point
    iv.loc[0, ["user_id", "lo", "hi"]] = (
        pts.user_id.iloc[0], pts.ts.iloc[0], pts.ts.iloc[0])
    iv.loc[1, ["user_id", "lo", "hi"]] = (
        pts.user_id.iloc[1], pts.ts.iloc[1] - 50, pts.ts.iloc[1])

    got = interval_join(rd.from_pandas(iv),
                        rd.from_pandas(pts[["user_id", "ts", "event_id"]]),
                        n_buckets=5).to_pandas()
    want = _brute_interval(iv, pts)

    got, want = _sorted(got, ["interval_id"]), _sorted(want, ["interval_id"])
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # the boundary intervals matched (inclusive ends), not dropped
    assert {0, 1} <= set(got.interval_id)


def test_interval_join_overlapping_intervals_count_independently(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.joins import interval_join

    pts = pd.DataFrame({"user_id": [5, 5, 5], "ts": [10, 20, 30],
                        "event_id": [100, 101, 102]})
    iv = pd.DataFrame({"interval_id": [0, 1, 2], "user_id": [5, 5, 5],
                       "lo": [0, 15, 25], "hi": [40, 40, 28]})
    out = (interval_join(rd.from_pandas(iv), rd.from_pandas(pts),
                         n_buckets=2).to_pandas()
           .sort_values("interval_id").reset_index(drop=True))
    assert out.n_points.tolist() == [3, 2]          # interval 2 matched nothing
    assert out.first_id.tolist() == [100, 101]
    assert out.last_id.tolist() == [102, 102]


def test_rolling_window_differential(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.events import rolling_window

    rng = np.random.default_rng(13)
    n = 500
    # integer-second time domain with collisions: tied ts must behave as
    # RANGE-frame peers (counted on both sides of the current row)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 15, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 2_000, n), unit="s").astype("datetime64[us]"),
        "event_id": np.arange(n, dtype=np.int64),
        "value": np.round(rng.uniform(0, 50, n), 2),
    })
    W = 300  # seconds

    got = (rolling_window(rd.from_pandas(df), window_s=W, n_buckets=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    cents = np.rint(df.value.to_numpy() * 100).astype(np.int64)
    want_n, want_s = [], []
    for i in range(n):
        m = ((df.user_id == df.user_id[i])
             & (df.ts >= df.ts[i] - pd.Timedelta(seconds=W))
             & (df.ts <= df.ts[i]))
        want_n.append(int(m.sum()))
        want_s.append(int(cents[m.to_numpy()].sum()))
    want = pd.DataFrame({"event_id": df.event_id, "w_n": want_n,
                         "w_sum_cents": want_s})

    assert (got.event_id.to_numpy() == want.event_id.to_numpy()).all()
    assert (got.w_n.to_numpy() == want.w_n.to_numpy()).all()
    assert (got.w_sum_cents.to_numpy() == want.w_sum_cents.to_numpy()).all()
    assert got.w_n.max() > 1  # fixture actually exercises multi-row windows


def test_hopping_window_differential(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.events import hopping_window

    rng = np.random.default_rng(17)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 12, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 50_000, n), unit="s").astype("datetime64[us]"),
        "value": np.round(rng.uniform(0, 50, n), 2),
    })
    W, H = 4000, 1000  # 4 hops per window

    got = (hopping_window(rd.from_pandas(df), window_s=W, hop_s=H,
                          n_buckets=3).to_pandas()
           .sort_values(["user_id", "win_start"]).reset_index(drop=True))

    # brute force: event t belongs to window starts s in (t-W, t], s % H == 0
    cents = np.rint(df.value.to_numpy() * 100).astype(np.int64)
    secs = df.ts.astype("datetime64[s]").astype(np.int64).to_numpy()
    rows = {}
    for i in range(n):
        base = (secs[i] // H) * H
        for k in range(W // H):
            s = base - k * H
            key = (df.user_id[i], s)
            c, t = rows.get(key, (0, 0))
            rows[key] = (c + 1, t + cents[i])
    want = (pd.DataFrame([(u, s, c, t) for (u, s), (c, t) in rows.items()],
                         columns=["user_id", "win_start", "n", "sum_cents"])
            .sort_values(["user_id", "win_start"]).reset_index(drop=True))

    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # windows genuinely overlap: total window rows > per-event count
    assert got.n.sum() == n * (W // H)


def test_hopping_window_rejects_nondivisible(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.events import hopping_window

    df = pd.DataFrame({"user_id": [1], "ts": pd.to_datetime([0], unit="s"),
                       "value": [1.0]})
    with pytest.raises(ValueError, match="multiple"):
        hopping_window(rd.from_pandas(df), window_s=5000, hop_s=1500)


def test_group_mode_differential(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.events import group_mode

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "k": rng.integers(0, 40, 800).astype(np.int64),
        "v": rng.choice(list("abcde"), 800),
    })
    # force an exact tie in one key: equal counts must pick the smaller value
    df = pd.concat([df[df.k != 39],
                    pd.DataFrame({"k": [39] * 4, "v": ["d", "b", "b", "d"]})],
                   ignore_index=True)

    got = (group_mode(rd.from_pandas(df), key="k", col="v", n_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))

    c = df.groupby(["k", "v"]).size().rename("n").reset_index()
    c = c.sort_values(["k", "n", "v"], ascending=[True, False, True])
    want = c.groupby("k").head(1).sort_values("k").reset_index(drop=True)

    assert len(got) == len(want)
    for col in ["k", "v", "n"]:
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col
    assert got[got.k == 39].v.item() == "b"   # tie broke lexicographically


def test_funnel_differential(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.events import funnel

    rng = np.random.default_rng(29)
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(0, 30, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 5_000, n), unit="s").astype("datetime64[us]"),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["A", "B", "C", "noise"], n,
                                 p=[0.2, 0.2, 0.1, 0.5]),
    })
    # user 40: B-before-A only => must NOT convert (order matters)
    extra = pd.DataFrame({
        "user_id": [40, 40, 40],
        "ts": pd.to_datetime([10, 20, 5], unit="s").astype("datetime64[us]"),
        "event_id": [9000, 9001, 9002],
        "event_type": ["B", "A", "C"],   # C at t=5 precedes A at t=20
    })
    # user 41: A, then B at the SAME microsecond => inclusive >= counts
    extra2 = pd.DataFrame({
        "user_id": [41, 41, 41],
        "ts": pd.to_datetime([30, 30, 31], unit="s").astype("datetime64[us]"),
        "event_id": [9100, 9101, 9102],
        "event_type": ["A", "B", "C"],
    })
    df = pd.concat([df, extra, extra2], ignore_index=True)

    got = (funnel(rd.from_pandas(df), steps=("A", "B", "C"), n_buckets=4)
           .to_pandas().sort_values("user_id").reset_index(drop=True))

    rows = []
    for u, grp in df.groupby("user_id"):
        t_prev, ok, chain = pd.Timestamp.min, True, []
        for s in ("A", "B", "C"):
            cand = grp[(grp.event_type == s) & (grp.ts >= t_prev)]
            if len(cand) == 0:
                ok = False
                break
            t_prev = cand.ts.min()
            chain.append(t_prev)
        if ok:
            rows.append((u, *chain))
    want = (pd.DataFrame(rows, columns=["user_id", "ts_A", "ts_B", "ts_C"])
            .sort_values("user_id").reset_index(drop=True))

    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert 40 not in set(got.user_id)
    assert 41 in set(got.user_id)


def test_lag_features_differential(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.events import lag_features

    rng = np.random.default_rng(3)
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(0, 25, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 10_000, n), unit="s").astype("datetime64[us]"),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b", "c"], n),
    })

    got = (lag_features(rd.from_pandas(df), n_buckets=4).to_pandas()
           .sort_values("event_id").reset_index(drop=True))

    o = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    us = o.ts.astype("datetime64[us]").astype(np.int64)
    g = o.groupby("user_id")
    want = pd.DataFrame({
        "event_id": o.event_id,
        "prev_gap_us": (us - us.groupby(o.user_id).shift(1)).fillna(-1)
                       .astype(np.int64),
        "prev_type": g.event_type.shift(1).fillna(""),
    }).sort_values("event_id").reset_index(drop=True)

    assert (got.event_id.to_numpy() == want.event_id.to_numpy()).all()
    assert (got.prev_gap_us.to_numpy() == want.prev_gap_us.to_numpy()).all()
    assert (got.prev_type.to_numpy() == want.prev_type.to_numpy()).all()
