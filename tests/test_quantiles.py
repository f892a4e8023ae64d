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
