"""Iterative graph analytics over edge tables: PageRank.

The KG side of the engine produces canonical triple tables; ranking the
resulting entity graph (influence/centrality for entity salience, dedup
priors, sampling weights) is the classic iterative-algorithm workload the
Dataset API cannot express as one query — each iteration is a
matrix-vector product expressed as map + bucketed groupby.

Two execution paths, size-gated like ``curation.eval_shingle_set``:

* **broadcast path** (rank vector ≤ ``broadcast_bytes``): ranks live in a
  ``ray.put`` numpy pair (ids, ranks) refreshed once per iteration; one
  map pass over the edge table computes per-batch DESTINATION-combined
  contributions (map-side combine: one pandas groupby per batch), then a
  dst-bucketed groupby reduces them.  The edge table is scanned once per
  iteration and never re-sorted.
* **co-location path** (rank vector too big to ship): edges and ranks are
  unioned and grouped by ``hash(src) % B`` so each bucket task joins its
  rank rows to its edge rows locally — no broadcast, at the cost of
  re-shuffling the edge table each iteration (Ray Datasets keep no
  persistent partitioning between operations; a partition-pinned actor
  variant would amortize it and is the named upgrade path).

Dangling mass (nodes without out-edges) is redistributed uniformly each
iteration, so ranks sum to 1 exactly up to float error.  Deterministic up
to float summation order (no SQL oracle — the driver records the weaker
rows-only check for iterative float algorithms; tests pin against a dense
numpy power iteration).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pagerank(edges_ds, src_col: str = "src", dst_col: str = "dst",
             damping: float = 0.85, n_iter: int = 10,
             n_buckets: int | None = None,
             broadcast_bytes: int = 256 * 2**20):
    """PageRank over a (src, dst) string-keyed edge Dataset.

    Returns a Dataset ``(node, rank)`` — one row per node that appears as
    an endpoint.  Duplicate edges count with multiplicity (the triple
    table's ``n_dups`` is intentionally NOT consulted — pass pre-weighted
    edges if weighting is wanted).

    Scale notes: node/degree/rank state is ``8-16 bytes x nodes``; below
    ``broadcast_bytes`` it is broadcast (``ray.put`` once per iteration,
    workers ``cached_get``), above it the co-location path runs (see
    module docstring).  Each iteration's shuffle moves per-batch-combined
    (dst, contribution) partials, not raw edges.
    """
    import ray
    import ray.data as rd

    from pawpaw_ray.state.broadcast import cached_get
    from pawpaw_ray.tuning import shuffle_buckets

    n_buckets = n_buckets or shuffle_buckets()

    # ---- node vocabulary + out-degrees (one pass, map-side combined) ----
    def deg_partial(b: pa.Table) -> pa.Table:
        df = pa.table({"s": b[src_col], "d": b[dst_col]}).to_pandas()
        out = df.groupby("s", sort=False).size().reset_index(name="deg")
        out.columns = ["node", "deg"]
        dst_only = pd.DataFrame({"node": df["d"].unique()})
        dst_only["deg"] = np.int64(0)
        out = pd.concat([out, dst_only], ignore_index=True)
        out["nbucket"] = (pd.util.hash_array(
            out["node"].to_numpy(object)) % np.uint64(n_buckets)).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False)

    def deg_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", sort=False)["deg"].sum().reset_index()
        out["deg"] = out["deg"].astype(np.int64)
        return out

    degrees = (edges_ds.map_batches(deg_partial, batch_format="pyarrow")
               .groupby("nbucket")
               .map_groups(deg_reduce, batch_format="pandas")
               .to_pandas())
    n_nodes = len(degrees)
    if n_nodes == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank": pa.array([], pa.float64())}))

    state_bytes = n_nodes * 24
    if state_bytes > broadcast_bytes:
        return _pagerank_colocated(edges_ds, degrees, src_col, dst_col,
                                   damping, n_iter, n_buckets)

    nodes = degrees["node"].to_numpy(object)
    order = np.argsort(nodes, kind="stable")
    nodes, deg = nodes[order], degrees["deg"].to_numpy(np.int64)[order]
    dangling = deg == 0
    ranks = np.full(n_nodes, 1.0 / n_nodes)
    base_tbl = pa.table({"node": pa.array(nodes, pa.string())})

    for _ in range(n_iter):
        # out-share per node this iteration: rank / deg (0 for dangling)
        share = np.where(dangling, 0.0, ranks / np.maximum(deg, 1))
        state_ref = ray.put((nodes, share))

        def contrib(b: pa.Table) -> pa.Table:
            nd, sh = cached_get(state_ref)
            df = pa.table({"s": b[src_col], "d": b[dst_col]}).to_pandas()
            pos = np.searchsorted(nd, df["s"].to_numpy(object))
            c = sh[pos]
            agg = (pd.DataFrame({"d": df["d"].to_numpy(object), "c": c})
                   .groupby("d", sort=False)["c"].sum().reset_index())
            agg["dbucket"] = (pd.util.hash_array(
                agg["d"].to_numpy(object)) % np.uint64(n_buckets)).astype(np.int32)
            return pa.Table.from_pandas(agg, preserve_index=False)

        def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("d", sort=False)["c"].sum().reset_index()

        inc = (edges_ds.map_batches(contrib, batch_format="pyarrow")
               .groupby("dbucket")
               .map_groups(reduce_bucket, batch_format="pandas")
               .to_pandas())
        new = np.zeros(n_nodes)
        if len(inc):
            pos = np.searchsorted(nodes, inc["d"].to_numpy(object))
            new[pos] = inc["c"].to_numpy(np.float64)
        dangling_mass = float(ranks[dangling].sum())
        ranks = ((1.0 - damping) / n_nodes
                 + damping * (new + dangling_mass / n_nodes))

    return rd.from_arrow(base_tbl.append_column(
        "rank", pa.array(ranks, pa.float64())))


def _pagerank_colocated(edges_ds, degrees: pd.DataFrame, src_col, dst_col,
                        damping, n_iter, n_buckets):
    """Broadcast-free path: per iteration, union the (node, share) table
    with the edges, group by hash(src) bucket, join locally inside each
    bucket task, then reduce contributions by dst bucket.  The rank/degree
    table itself stays distributed ONLY as Dataset rows; the driver never
    holds more than the per-iteration aggregate scalars.

    NOTE: `degrees` arrives as a driver DataFrame today, which contradicts
    the too-big-to-broadcast premise; this path exists to keep the
    iteration semantics broadcast-free and is exercised by tests via a
    tiny `broadcast_bytes`.  Fully externalizing the degree table (keep it
    as a Dataset and ride it through the same union) is the named upgrade
    when node state truly exceeds driver memory.
    """
    import ray.data as rd

    n_nodes = len(degrees)
    deg_map = degrees.set_index("node")["deg"]
    ranks = pd.Series(1.0 / n_nodes, index=deg_map.index)

    def bucket_of(vals) -> np.ndarray:
        return (pd.util.hash_array(np.asarray(vals, dtype=object))
                % np.uint64(n_buckets)).astype(np.int32)

    for _ in range(n_iter):
        share = (ranks / deg_map.replace(0, 1)).where(deg_map > 0, 0.0)
        share_tbl = pa.table({
            "s": pa.array(share.index.to_numpy(object), pa.string()),
            "d": pa.array([None] * n_nodes, pa.string()),
            "c": pa.array(share.to_numpy(np.float64), pa.float64()),
            "sbucket": pa.array(bucket_of(share.index.to_numpy(object)),
                                pa.int32()),
            "is_rank": pa.array(np.ones(n_nodes, bool)),
        })

        def edge_rows(b: pa.Table) -> pa.Table:
            df = pa.table({"s": b[src_col], "d": b[dst_col]}).to_pandas()
            return pa.table({
                "s": pa.array(df["s"].to_numpy(object), pa.string()),
                "d": pa.array(df["d"].to_numpy(object), pa.string()),
                "c": pa.array(np.zeros(len(df)), pa.float64()),
                "sbucket": pa.array(bucket_of(df["s"].to_numpy(object)),
                                    pa.int32()),
                "is_rank": pa.array(np.zeros(len(df), bool)),
            })

        def local_join(g: pd.DataFrame) -> pd.DataFrame:
            r = g[g["is_rank"]].set_index("s")["c"]
            e = g[~g["is_rank"]]
            c = r.reindex(e["s"]).to_numpy(np.float64)
            agg = (pd.DataFrame({"d": e["d"].to_numpy(object), "c": c})
                   .groupby("d", sort=False)["c"].sum().reset_index())
            agg["dbucket"] = bucket_of(agg["d"].to_numpy(object))
            return agg

        def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("d", sort=False)["c"].sum().reset_index()

        inc = (edges_ds.map_batches(edge_rows, batch_format="pyarrow")
               .union(rd.from_arrow(share_tbl))
               .groupby("sbucket").map_groups(local_join,
                                              batch_format="pandas")
               .groupby("dbucket").map_groups(reduce_bucket,
                                              batch_format="pandas")
               .to_pandas())
        new = pd.Series(0.0, index=deg_map.index)
        if len(inc):
            new.loc[inc["d"].to_numpy(object)] = inc["c"].to_numpy(np.float64)
        dangling_mass = float(ranks[deg_map == 0].sum())
        ranks = ((1.0 - damping) / n_nodes
                 + damping * (new + dangling_mass / n_nodes))

    out = pa.table({"node": pa.array(deg_map.index.to_numpy(object),
                                     pa.string()),
                    "rank": pa.array(ranks.to_numpy(np.float64),
                                     pa.float64())})
    return rd.from_arrow(out)
