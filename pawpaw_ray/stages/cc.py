"""Distributed connected components (min-label) over a candidate-pair list.

Replaces the round-1 driver-side union-find: clustering for the near-dup
operators now runs as alternating **large-star / small-star** rounds
(Kiveris et al., "Connected Components in MapReduce and Beyond", 2014)
expressed as bucketed Ray Data groupbys over the edge list.  Each round
shuffles only ``(u, v)`` int64 rows — the pair list never lands on the
driver, so it can exceed driver memory at 100 TB scale.  Components
converge to stars centered at the component's minimum node in O(log n)
rounds; per-node labels fall out of the final star edges with one more
aggregate.

Semantics match min-label union-find exactly: every node's ``cluster_id``
is the smallest node id in its connected component (differentially tested
against a driver union-find in tests/test_cc.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pawpaw_ray.tuning import shuffle_buckets

_EMPTY_EDGES = pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                             "v": pd.Series([], dtype=np.int64)})


def _bucket_col(vals: np.ndarray, n_buckets: int) -> pa.Array:
    # vectorized 64-bit mix → bucket (murmur3 finalizer): keeps sequential
    # ids from landing in one reduce partition without per-element Python —
    # this runs twice per star round over the whole edge list
    v = np.ascontiguousarray(vals, dtype=np.int64).view(np.uint64)
    v = (v ^ (v >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    v = v ^ (v >> np.uint64(33))
    return pa.array((v % np.uint64(n_buckets)).astype(np.int32), pa.int32())


def _large_star_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    m = min(N(u) ∪ {u}).  Input rows are symmetric (u, v) edges."""
    if not len(g):
        return _EMPTY_EDGES
    mn = g.groupby("u", sort=False)["v"].min()
    m = pd.Series(np.minimum(mn.to_numpy(np.int64),
                             mn.index.to_numpy(np.int64)), index=mn.index)
    gm = g["u"].map(m)
    keep = (g["v"] > g["u"]).to_numpy()
    out = pd.DataFrame({"u": g["v"].to_numpy(np.int64)[keep],
                        "v": gm.to_numpy(np.int64)[keep]})
    out = out[out["u"] != out["v"]]
    return out.drop_duplicates()


def _small_star_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Edges arrive oriented larger→smaller (u > v).  For each u:
    m = min(N(u)); connect every neighbor and u itself to m."""
    if not len(g):
        return _EMPTY_EDGES
    m = g.groupby("u", sort=False)["v"].min()
    gm = g["u"].map(m).to_numpy(np.int64)
    out = pd.concat([
        pd.DataFrame({"u": g["v"].to_numpy(np.int64), "v": gm}),
        pd.DataFrame({"u": m.index.to_numpy(np.int64),
                      "v": m.to_numpy(np.int64)}),
    ], ignore_index=True)
    out = out[out["u"] != out["v"]]
    return out.drop_duplicates()


def _symmetrize(b: pa.Table, n_buckets: int) -> pa.Table:
    u = b["u"].to_numpy().astype(np.int64)
    v = b["v"].to_numpy().astype(np.int64)
    uu = np.concatenate([u, v])
    vv = np.concatenate([v, u])
    keep = uu != vv
    uu, vv = uu[keep], vv[keep]
    return pa.table({"u": pa.array(uu, pa.int64()),
                     "v": pa.array(vv, pa.int64()),
                     "bucket": _bucket_col(uu, n_buckets)})


def _orient_down(b: pa.Table, n_buckets: int) -> pa.Table:
    """Canonical larger→smaller orientation for the small-star round."""
    u = b["u"].to_numpy().astype(np.int64)
    v = b["v"].to_numpy().astype(np.int64)
    hi = np.maximum(u, v)
    lo = np.minimum(u, v)
    keep = hi != lo
    hi, lo = hi[keep], lo[keep]
    return pa.table({"u": pa.array(hi, pa.int64()),
                     "v": pa.array(lo, pa.int64()),
                     "bucket": _bucket_col(hi, n_buckets)})


def _signature(edges_ds) -> tuple[int, int]:
    """(count, order-insensitive hash) of the canonical edge set — the
    convergence check, computed distributed (one tiny aggregate)."""
    from ray.data.aggregate import Sum

    def hash_batch(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy().astype(np.uint64)
        v = b["v"].to_numpy().astype(np.uint64)
        hi, lo = np.maximum(u, v), np.minimum(u, v)
        h = (hi * np.uint64(0x9E3779B97F4A7C15)
             ^ (lo + np.uint64(0xD1B54A32D192ED03)))
        # fold to int64 to keep the Sum aggregate in native arrow types
        return pa.table({
            "h": pa.array((h >> np.uint64(1)).astype(np.int64), pa.int64()),
            "one": pa.array(np.ones(len(h), dtype=np.int64), pa.int64())})

    agg = edges_ds.map_batches(hash_batch, batch_format="pyarrow").sum(["one", "h"])
    if agg is None:  # empty dataset
        return (0, 0)
    return (int(agg["sum(one)"]), int(agg["sum(h)"]))


def _unionfind_star(g: pd.DataFrame) -> pd.DataFrame:
    """One-task min-label union-find over a SMALL edge list → star edges
    (node → component min), the same output shape the star rounds converge
    to.  Runs inside a Ray task (size-gated by ``cc_labels``), never on the
    driver."""
    if not len(g):
        return _EMPTY_EDGES
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in zip(g["u"].to_numpy(np.int64), g["v"].to_numpy(np.int64)):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:  # min-label union
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    nodes = np.fromiter(parent.keys(), dtype=np.int64, count=len(parent))
    roots = np.fromiter((find(int(n)) for n in nodes), dtype=np.int64,
                        count=len(nodes))
    keep = nodes != roots
    return pd.DataFrame({"u": nodes[keep], "v": roots[keep]})


# Below this many edges the graph collapses to ONE task doing union-find —
# the star rounds' per-round fixed cost (two groupby shuffles + a
# convergence aggregate) dominates small graphs.  At 100 TB the edge list
# blows past this and takes the O(log n)-round distributed path; the
# threshold only ever routes work that trivially fits one worker's heap
# (~16 bytes/edge → ≤ ~32 MB).
SMALL_GRAPH_EDGES = 2_000_000


def cc_labels(pairs_ds, ids_ds, id_col: str = "doc_id",
              label_col: str = "cluster_id", n_buckets: int | None = None,
              max_rounds: int = 32,
              small_graph_edges: int = SMALL_GRAPH_EDGES):
    """Min-label connected components.

    ``pairs_ds``: Dataset with int64 columns ``a``, ``b`` (undirected edges,
    duplicates fine).  ``ids_ds``: Dataset holding ``id_col`` for EVERY node
    (isolated nodes become their own singleton cluster).  Returns a Dataset
    ``(id_col, label_col)`` where the label is the component's min node id.

    Size-adaptive: small edge lists run one in-task union-find; large ones
    run the large-star/small-star rounds (identical output, differentially
    tested both ways).
    """
    import ray.data  # noqa: F401  (Dataset ops)
    from ray.data.aggregate import Min

    n_buckets = n_buckets or shuffle_buckets()

    def to_edges(b: pa.Table) -> pa.Table:
        return pa.table({"u": b["a"].cast(pa.int64()),
                         "v": b["b"].cast(pa.int64())})

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow").materialize()
    prev = None
    n_edges = edges.count()
    if 0 < n_edges <= small_graph_edges:
        edges = (edges.repartition(1)
                 .map_batches(_unionfind_star, batch_format="pandas",
                              batch_size=None)
                 .materialize())
    elif n_edges > 0:
        converged = False
        for _ in range(max_rounds):
            large = (edges
                     .map_batches(lambda b: _symmetrize(b, n_buckets),
                                  batch_format="pyarrow")
                     .groupby("bucket")
                     .map_groups(_large_star_bucket, batch_format="pandas"))
            edges = (large
                     .map_batches(lambda b: _orient_down(b, n_buckets),
                                  batch_format="pyarrow")
                     .groupby("bucket")
                     .map_groups(_small_star_bucket, batch_format="pandas")
                     .materialize())
            sig = _signature(edges)
            if sig == prev or sig[0] == 0:
                converged = True
                break
            prev = sig
        if not converged:
            # labels from a non-fixed-point edge set can split components;
            # make that an observable failure, not silently wrong output
            raise RuntimeError(
                f"cc_labels: star contraction did not converge in "
                f"{max_rounds} rounds (last signature {prev}); raise "
                f"max_rounds for this graph")

    # star edges (u → root) become labels; every id contributes its own id so
    # roots and isolated nodes label themselves; min() resolves the rest
    def edge_labels(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["u"].cast(pa.int64()),
                         "label": b["v"].cast(pa.int64())})

    def self_labels(b: pa.Table) -> pa.Table:
        ids = b[id_col].cast(pa.int64())
        return pa.table({"node": ids, "label": ids})

    labels = (edges.map_batches(edge_labels, batch_format="pyarrow")
              .union(ids_ds.map_batches(self_labels, batch_format="pyarrow"))
              .groupby("node").aggregate(Min("label", alias_name=label_col)))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b["node"], label_col: b[label_col]})

    return labels.map_batches(rename, batch_format="pyarrow")


def cc_labels_pandas(pairs_ds, ids_ds, id_col: str = "doc_id",
                     label_col: str = "cluster_id", **kw) -> pd.DataFrame:
    """Driver-convenience wrapper: distributed components, small pandas
    result sorted by id (the shape the driver queries return)."""
    out = cc_labels(pairs_ds, ids_ds, id_col, label_col, **kw).to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)
