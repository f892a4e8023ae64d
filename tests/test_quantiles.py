"""Exact distributed quantiles (stages/quantiles.py): range-binning
selection vs numpy's exact order statistic, including refinement rounds,
duplicate-heavy (degenerate-bin) distributions, and edge ranks."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pawpaw_ray.stages.quantiles import exact_quantiles


def _naive(x: np.ndarray, q: float) -> tuple[int, float]:
    rank = int(math.ceil(q * len(x))) or 1
    return rank, float(np.sort(x)[rank - 1])


def _make_ds(x: np.ndarray, parts: int = 4):
    import ray.data as rd

    return rd.from_arrow(pa.table({"value": pa.array(x, pa.float64())})
                         ).repartition(parts)


def test_exact_quantiles_vs_numpy(ray_session):
    rng = np.random.RandomState(3)
    x = rng.normal(10.0, 5.0, size=20_000)
    qs = (0.01, 0.25, 0.5, 0.9, 0.999)
    # tiny gate forces at least one refinement round at this size
    out = exact_quantiles(_make_ds(x), "value", qs=qs,
                          n_bins=64, gate_rows=500).to_pandas()
    assert list(out["q"]) == sorted(qs)
    for _, r in out.iterrows():
        rank, val = _naive(x, r["q"])
        assert r["rank"] == rank
        assert r["value"] == val, r["q"]


def test_exact_quantiles_duplicate_heavy(ray_session):
    """A value held by 60% of rows: its bin never shrinks below the gate,
    so the degenerate-bin short-circuit must resolve it exactly."""
    rng = np.random.RandomState(5)
    x = np.concatenate([np.full(12_000, 7.5), rng.uniform(0, 20, 8_000)])
    rng.shuffle(x)
    out = exact_quantiles(_make_ds(x), "value", qs=(0.5, 0.95),
                          n_bins=32, gate_rows=100,
                          max_rounds=12).to_pandas()
    for _, r in out.iterrows():
        rank, val = _naive(x, r["q"])
        assert (r["rank"], r["value"]) == (rank, val), r["q"]


def test_exact_quantiles_extremes_and_integers(ray_session):
    """Integer-valued doubles sit exactly on bin edges; q=1.0 is the max."""
    x = np.arange(1, 5_001, dtype=np.float64)
    out = exact_quantiles(_make_ds(x, parts=7), "value",
                          qs=(0.0001, 0.5, 1.0), n_bins=16,
                          gate_rows=50, max_rounds=12).to_pandas()
    for _, r in out.iterrows():
        rank, val = _naive(x, r["q"])
        assert (r["rank"], r["value"]) == (rank, val), r["q"]


def test_exact_quantiles_empty(ray_session):
    out = exact_quantiles(_make_ds(np.array([], dtype=np.float64), parts=1),
                          "value").to_pandas()
    assert len(out) == 0


def test_quantiles_unconverged_raises_preemptively(ray_session):
    """An interval that never narrows below the gate must fail with the
    max_rounds error BEFORE the final pull materializes it on the driver
    (round-4 advice: graceful error, not driver OOM)."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from pawpaw_ray.stages.quantiles import exact_quantiles

    vals = np.random.RandomState(3).uniform(0, 1, 200)
    ds = rd.from_arrow(pa.table({"value": pa.array(vals, pa.float64())}))
    with pytest.raises(RuntimeError, match="did not converge"):
        exact_quantiles(ds, "value", qs=(0.5,), gate_rows=2, max_rounds=0)


def test_grouped_quantiles_vs_numpy(ray_session):
    """Per-group rank-ceil(q*n) values vs a brute-force per-group sort,
    including a 1-row group, a duplicate-heavy group, and NaNs."""
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pawpaw_ray.stages.quantiles import grouped_quantiles

    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], 400),
        "value": rng.uniform(0, 100, 400),
    })
    df.loc[df.k == "d", "value"] = 7.0          # duplicate-heavy group
    df = pd.concat([df, pd.DataFrame({"k": ["solo"], "value": [3.25]})],
                   ignore_index=True)
    df.loc[5, "value"] = np.nan                  # excluded from ranking

    qs = (0.25, 0.5, 0.9, 0.99)
    got = (grouped_quantiles(rd.from_pandas(df), key="k", col="value",
                             qs=qs, n_buckets=3)
           .to_pandas().sort_values(["k", "q"]).reset_index(drop=True))

    rows = []
    for k, grp in df.groupby("k"):
        v = np.sort(grp.value.dropna().to_numpy())
        for q in qs:
            r = max(1, math.ceil(q * len(v)))
            rows.append((k, q, r, v[r - 1]))
    want = (pd.DataFrame(rows, columns=["k", "q", "rank", "value"])
            .sort_values(["k", "q"]).reset_index(drop=True))

    assert len(got) == len(want)
    assert (got.k.to_numpy() == want.k.to_numpy()).all()
    assert (got["rank"].to_numpy() == want["rank"].to_numpy()).all()
    assert (got.value.to_numpy() == want.value.to_numpy()).all()
    assert (got[got.k == "solo"]["value"] == 3.25).all()
