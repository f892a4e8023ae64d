"""Generic semi/anti join + per-key top-k (stages/relational.py):
differentials against pandas references, BOTH semi-join paths (broadcast
isin and Ray-native left_semi/left_anti via a forced zero byte gate),
duplicate right keys, string keys, ties, and k larger than a group.
"""

import numpy as np
import pandas as pd
import pytest


def _frames(seed=5):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, 50, 300).astype(np.int64),
        "payload": rng.integers(0, 10**6, 300).astype(np.int64),
    })
    # duplicate right keys on purpose: semi must not duplicate left rows
    right = pd.DataFrame({
        "k": np.repeat(rng.choice(50, 18, replace=False).astype(np.int64), 3),
        "other": np.arange(54, dtype=np.int64),
    })
    return left, right


@pytest.mark.parametrize("gate", [None, 0])  # None=broadcast isin, 0=native
@pytest.mark.parametrize("anti", [False, True])
def test_semi_anti_join_differential(ray_session, gate, anti):
    import ray.data as rd

    from pawpaw_ray.stages.relational import semi_join

    left, right = _frames()
    kw = {} if gate is None else {"broadcast_bytes": 0, "num_partitions": 4}
    got = (semi_join(rd.from_pandas(left), rd.from_pandas(right),
                     on="k", anti=anti, **kw).to_pandas()
           [["k", "payload"]]
           .sort_values(["k", "payload"]).reset_index(drop=True))

    member = left.k.isin(set(right.k))
    want = (left[~member if anti else member]
            .sort_values(["k", "payload"]).reset_index(drop=True))
    assert len(got) == len(want)
    assert (got.to_numpy() == want.to_numpy()).all()


def test_semi_join_string_keys(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.relational import semi_join

    left = pd.DataFrame({"k": ["a", "b", "c", "a", "d"],
                         "v": [1, 2, 3, 4, 5]})
    right = pd.DataFrame({"k": ["a", "d", "zz"]})
    got = (semi_join(rd.from_pandas(left), rd.from_pandas(right), on="k")
           .to_pandas().sort_values("v"))
    assert got.v.tolist() == [1, 4, 5]
    got_a = (semi_join(rd.from_pandas(left), rd.from_pandas(right),
                       on="k", anti=True).to_pandas().sort_values("v"))
    assert got_a.v.tolist() == [2, 3]
    # native join path must agree on string keys too
    got_n = (semi_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                       broadcast_bytes=0, num_partitions=2)
             .to_pandas().sort_values("v"))
    assert got_n.v.tolist() == [1, 4, 5]


def test_group_topk_differential(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.relational import group_topk

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "key": rng.integers(0, 30, 500).astype(np.int64),
        # small score domain => plenty of within-key ties
        "score": rng.integers(0, 8, 500).astype(np.int64),
        "id": np.arange(500, dtype=np.int64),
    })
    # one key with fewer rows than k
    df.loc[df.key == 29, "key"] = 28
    df.loc[0, "key"] = 29

    k = 4
    got = (group_topk(rd.from_pandas(df), key="key", order_col="score",
                      k=k, ascending=False, tie_col="id", n_buckets=5)
           .to_pandas().sort_values(["key", "rank"]).reset_index(drop=True))

    o = df.sort_values(["key", "score", "id"], ascending=[True, False, True],
                       kind="mergesort")
    want = o.groupby("key", sort=False).head(k).copy()
    want["rank"] = want.groupby("key", sort=False).cumcount() + 1
    want = want.sort_values(["key", "rank"]).reset_index(drop=True)

    assert len(got) == len(want)
    for c in ["key", "score", "id", "rank"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # the 1-row key survives with a single rank-1 row
    assert got[got.key == 29]["rank"].tolist() == [1]


def test_pivot_counts_differential(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.relational import pivot_counts

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "k": rng.integers(0, 25, 600).astype(np.int64),
        "c": rng.choice(["x", "y", "z", "IGNORED"], 600),
    })
    cats = ("x", "y", "z")
    got = (pivot_counts(rd.from_pandas(df), key="k", cat_col="c",
                        categories=cats, n_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))

    want = (df[df.c.isin(cats)].groupby(["k", "c"]).size().unstack("c")
            .reindex(columns=list(cats), fill_value=0).fillna(0)
            .astype(np.int64).reset_index())
    want.columns = ["k"] + [f"n_{c}" for c in cats]
    # keys whose rows were ALL out-of-category never appear on got's side
    want = want[(want[[f"n_{c}" for c in cats]].sum(axis=1)) > 0]
    want = want.sort_values("k").reset_index(drop=True)

    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_pivot_counts_all_out_of_category_block(ray_session):
    """A block whose rows are ALL out-of-category must contribute an
    empty partial with the right schema, not a schema-drift error."""
    import ray.data as rd

    from pawpaw_ray.stages.relational import pivot_counts

    a = pd.DataFrame({"k": [1, 2], "c": ["x", "y"]})
    b = pd.DataFrame({"k": [3, 4], "c": ["junk", "junk"]})
    ds = rd.from_pandas(a).union(rd.from_pandas(b))
    got = (pivot_counts(ds, key="k", cat_col="c", categories=("x", "y"),
                        n_buckets=2).to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert got.k.tolist() == [1, 2]
    assert got.n_x.tolist() == [1, 0]
    assert got.n_y.tolist() == [0, 1]


def test_distinct_count_differential(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.relational import distinct_count

    rng = np.random.default_rng(37)
    df = pd.DataFrame({
        "k": rng.integers(0, 20, 700).astype(np.int64),
        "v": rng.integers(0, 9, 700).astype(np.int64),  # heavy duplication
    })
    got = (distinct_count(rd.from_pandas(df), key="k", val_col="v",
                          n_buckets=4).to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = (df.groupby("k").v.nunique().rename("n_distinct").reset_index()
            .sort_values("k").reset_index(drop=True))
    assert len(got) == len(want)
    assert (got.k.to_numpy() == want.k.to_numpy()).all()
    assert (got.n_distinct.to_numpy() == want.n_distinct.to_numpy()).all()


def test_group_topk_ascending(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.relational import group_topk

    df = pd.DataFrame({"key": [1, 1, 1, 2], "score": [5, 2, 9, 7],
                       "id": [10, 11, 12, 13]})
    got = (group_topk(rd.from_pandas(df), key="key", order_col="score",
                      k=2, ascending=True, tie_col="id", n_buckets=2)
           .to_pandas().sort_values(["key", "rank"]))
    assert got.id.tolist() == [11, 10, 13]
    assert got["rank"].tolist() == [1, 2, 1]


def test_approx_distinct_global(ray_session):
    """HLL global estimate: block-count INVARIANT (bit-deterministic
    merge) and within ~5 sigma of exact on a 10k-distinct fixture."""
    import ray.data as rd

    from pawpaw_ray.stages.relational import approx_distinct

    rng = np.random.default_rng(47)
    vals = rng.integers(0, 10_000, 40_000).astype(np.int64)  # ~9.8k distinct
    exact = len(np.unique(vals))
    df = pd.DataFrame({"v": vals})

    est1 = approx_distinct(rd.from_pandas(df).repartition(2), "v", p=12)
    est8 = approx_distinct(rd.from_pandas(df).repartition(8), "v", p=12)
    assert est1[est1.columns[0]].item() == est8[est8.columns[0]].item()
    e = est1["n_approx"].item()
    assert abs(e - exact) / exact < 0.05, (e, exact)


def test_approx_distinct_per_key(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.relational import approx_distinct

    rng = np.random.default_rng(53)
    df = pd.DataFrame({
        "k": rng.integers(0, 8, 30_000).astype(np.int64),
        "v": rng.integers(0, 3_000, 30_000).astype(np.int64),
    })
    got = (approx_distinct(rd.from_pandas(df), "v", key="k", p=12,
                           n_buckets=3).to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = df.groupby("k").v.nunique()
    assert len(got) == 8
    for _, r in got.iterrows():
        exact = want[r.k]
        assert abs(r.n_approx - exact) / exact < 0.08, (r.k, r.n_approx, exact)


@pytest.mark.parametrize("anti", [False, True])
def test_semi_join_bloom_prefilter_exact(ray_session, anti):
    """Bloom-prefiltered native path must equal the plain native path
    EXACTLY (Bloom negatives are definite non-members; positives are
    re-verified by the exact join) — on a fixture sized so the tiny
    filter (256 bits for ~18 keys) actually produces false positives."""
    import ray.data as rd

    from pawpaw_ray.stages.relational import semi_join

    left, right = _frames(seed=61)
    base = (semi_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                      anti=anti, broadcast_bytes=0, num_partitions=4)
            .to_pandas().sort_values(["k", "payload"])
            .reset_index(drop=True))
    bloom = (semi_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                       anti=anti, broadcast_bytes=0, num_partitions=4,
                       bloom_bits=256)
             .to_pandas().sort_values(["k", "payload"])
             .reset_index(drop=True))
    assert len(base) == len(bloom)
    assert (base.to_numpy() == bloom.to_numpy()).all()


def test_bloom_filter_no_false_negatives(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.relational import (
        _bloom_member,
        build_bloom,
    )

    keys = pd.DataFrame({"k": np.arange(500, dtype=np.int64)})
    bits = build_bloom(rd.from_pandas(keys), "k", m_bits=1 << 14)
    member = _bloom_member(keys.k.to_numpy(), bits, 7)
    assert member.all()          # a Bloom filter NEVER misses a member
    probe = _bloom_member(np.arange(10_000, 20_000, dtype=np.int64),
                          bits, 7)
    assert probe.mean() < 0.05   # and stays near its design fp rate
