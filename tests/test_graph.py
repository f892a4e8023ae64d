"""PageRank (stages/graph.py) vs a dense numpy power iteration with the
identical semantics (duplicate-edge multiplicity, uniform dangling-mass
redistribution, (1-d)/n teleport) — both execution paths pinned equal."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pawpaw_ray.stages.graph import pagerank


def _naive(edges: list[tuple[str, str]], damping=0.85, n_iter=10):
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    s = np.array([idx[a] for a, _ in edges])
    d = np.array([idx[b] for _, b in edges])
    deg = np.bincount(s, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        share = np.where(deg > 0, r / np.maximum(deg, 1), 0.0)
        new = np.zeros(n)
        np.add.at(new, d, share[s])
        dm = r[deg == 0].sum()
        r = (1 - damping) / n + damping * (new + dm / n)
    return dict(zip(nodes, r))


def _edges_ds(edges, parts=4):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.string()),
        "dst": pa.array([b for _, b in edges], pa.string()),
    })).repartition(parts)


def _random_edges(n_nodes=120, n_edges=600, seed=2):
    rng = np.random.RandomState(seed)
    names = [f"n{i:03d}" for i in range(n_nodes)]
    edges = [(names[rng.randint(n_nodes)], names[rng.randint(n_nodes)])
             for _ in range(n_edges)]
    # a few guaranteed dangling sinks and duplicate edges
    edges += [("n000", "sinkA"), ("n001", "sinkB"), ("n000", "sinkA")]
    return edges


@pytest.mark.parametrize("method", ["broadcast", "colocated", "pinned"])
def test_pagerank_vs_dense(ray_session, method):
    edges = _random_edges()
    exp = _naive(edges)
    out = (pagerank(_edges_ds(edges), n_iter=10, n_buckets=8,
                    method=method, pinned_shards=3)
           .to_pandas().set_index("node")["rank"])
    assert len(out) == len(exp)
    assert abs(out.sum() - 1.0) < 1e-9
    for node, r in exp.items():
        assert out[node] == pytest.approx(r, rel=1e-9, abs=1e-12), node


def test_pagerank_paths_agree(ray_session):
    edges = _random_edges(seed=9)
    a = (pagerank(_edges_ds(edges, 3), n_iter=6, n_buckets=4)
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (pagerank(_edges_ds(edges, 5), n_iter=6, n_buckets=16,
                  method="colocated")
         .to_pandas().sort_values("node").reset_index(drop=True))
    c = (pagerank(_edges_ds(edges, 5), n_iter=6, method="pinned",
                  pinned_shards=4)
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert (a["node"] == b["node"]).all()
    assert np.allclose(a["rank"], b["rank"], rtol=1e-9)
    assert (a["node"] == c["node"]).all()
    assert np.allclose(a["rank"], c["rank"], rtol=1e-9)
    # auto dispatch: a zero broadcast budget routes to the pinned path
    d = (pagerank(_edges_ds(edges, 5), n_iter=6, broadcast_bytes=0,
                  pinned_shards=4)
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert np.allclose(a["rank"], d["rank"], rtol=1e-9)


def test_pagerank_empty(ray_session):
    out = pagerank(_edges_ds([("a", "b")], 1).filter(
        lambda r: False)).to_pandas()
    assert len(out) == 0


def test_pagerank_pinned_empty_shards(ray_session):
    """More shards than occupied buckets: empty actors must be inert
    (zero-length handshakes, empty contrib arrays, empty result tables)."""
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a")]
    exp = _naive(edges, n_iter=5)
    out = (pagerank(_edges_ds(edges, 2), n_iter=5, method="pinned",
                    pinned_shards=8)
           .to_pandas().set_index("node")["rank"])
    assert len(out) == len(exp)
    for node, r in exp.items():
        assert out[node] == pytest.approx(r, rel=1e-9, abs=1e-12), node
