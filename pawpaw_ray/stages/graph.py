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
        out["nbucket"] = g["nbucket"].iloc[0]
        return out

    # (node, deg, nbucket) — stays DISTRIBUTED until the gate decides;
    # only the broadcast path pulls it to the driver
    degrees_ds = (edges_ds.map_batches(deg_partial, batch_format="pyarrow")
                  .groupby("nbucket")
                  .map_groups(deg_reduce, batch_format="pandas")
                  .materialize())
    n_nodes = degrees_ds.count()
    if n_nodes == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank": pa.array([], pa.float64())}))

    state_bytes = n_nodes * 24
    if state_bytes > broadcast_bytes:
        return _pagerank_colocated(edges_ds, degrees_ds, n_nodes,
                                   src_col, dst_col,
                                   damping, n_iter, n_buckets)

    degrees = degrees_ds.drop_columns(["nbucket"]).to_pandas()
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


def _pagerank_colocated(edges_ds, degrees_ds, n_nodes: int, src_col,
                        dst_col, damping, n_iter, n_buckets):
    """Broadcast-free path for rank vectors too big to ship to workers:
    ALL node state (degree, rank) lives as Dataset rows end to end — the
    driver holds only two scalars per iteration (the dangling mass and
    the teleport floor).

    Per iteration, three bucketed shuffles of compact rows:

    1. degree rows ∪ rank rows by ``hash(node) % B`` → per-node out-share
       ``rank / deg`` (0 for dangling), joined locally in each bucket
       task.  Nodes missing from the rank table hold exactly the previous
       iteration's teleport floor (they received no contribution), so the
       in-task reindex fills with that scalar — no node is ever dropped.
       The task also emits one dangling-mass partial row (kind=3).
    2. share rows ∪ edge rows by src bucket → local join → per-dst
       combined contributions.
    3. contributions by dst bucket → new rank rows
       ``floor + damping * incoming``.

    All blocks are uniform (node, d, val, kind, bucket) pandas frames
    ("" placeholder instead of NULL in d — a union of blocks must never
    let an all-null column drift to a different dtype).  Edge rows are
    re-shuffled each iteration (Ray Datasets keep no persistent
    partitioning between operations; a partition-pinned actor variant
    would amortize that and is the named upgrade path).
    """
    import ray.data as rd

    K_DEG, K_RANK, K_EDGE, K_DANG = 0, 1, 2, 3

    def bucket_of(vals) -> np.ndarray:
        return (pd.util.hash_array(np.asarray(vals, dtype=object))
                % np.uint64(n_buckets)).astype(np.int32)

    def frame(node, d, val, kind, bucket) -> pd.DataFrame:
        return pd.DataFrame({
            "node": np.asarray(node, dtype=object),
            "d": np.asarray(d, dtype=object),
            "val": np.asarray(val, dtype=np.float64),
            "kind": np.full(len(node), kind, dtype=np.int8),
            "bucket": np.asarray(bucket, dtype=np.int32),
        })

    def deg_rows(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        n = df["node"].to_numpy(object)
        return frame(n, [""] * len(df), df["deg"].to_numpy(np.float64),
                     K_DEG, df["nbucket"].to_numpy(np.int32))

    def edge_rows(b: pa.Table) -> pd.DataFrame:
        df = pa.table({"s": b[src_col], "d": b[dst_col]}).to_pandas()
        s_arr = df["s"].to_numpy(object)
        return frame(s_arr, df["d"].to_numpy(object),
                     np.zeros(len(df)), K_EDGE, bucket_of(s_arr))

    degree_rows = (degrees_ds.map_batches(deg_rows, batch_format="pyarrow")
                   .materialize())
    rank_rows = None              # iteration 0: everyone at 1/n via floor
    floor = 1.0 / n_nodes         # rank of any node absent from rank_rows

    for _ in range(n_iter):
        floor_now = floor

        def share_bucket(g: pd.DataFrame) -> pd.DataFrame:
            deg = g[g["kind"] == K_DEG].set_index("node")["val"]
            rnk = g[g["kind"] == K_RANK].set_index("node")["val"] \
                .reindex(deg.index, fill_value=floor_now)
            share = (rnk / deg.where(deg > 0, 1.0)).where(deg > 0, 0.0)
            nodes = deg.index.to_numpy(object)
            out = frame(nodes, [""] * len(nodes),
                        share.to_numpy(np.float64), K_RANK,
                        bucket_of(nodes))
            dang = frame([""], [""], [float(rnk[deg == 0].sum())],
                         K_DANG, [0])
            return pd.concat([out, dang], ignore_index=True)

        pass1 = degree_rows if rank_rows is None \
            else degree_rows.union(rank_rows)
        shares = (pass1.groupby("bucket")
                  .map_groups(share_bucket, batch_format="pandas")
                  .materialize())

        dangling_mass = float(sum(
            b["val"].to_pandas().sum() for b in
            shares.filter(expr="kind == 3")
                  .iter_batches(batch_format="pyarrow")))
        floor = ((1.0 - damping) / n_nodes
                 + damping * dangling_mass / n_nodes)
        floor_next = floor

        def contrib_bucket(g: pd.DataFrame) -> pd.DataFrame:
            g = g[g["kind"] != K_DANG]
            sh = g[g["kind"] == K_RANK].set_index("node")["val"]
            e = g[g["kind"] == K_EDGE]
            c = sh.reindex(e["node"]).fillna(0.0).to_numpy(np.float64)
            agg = (pd.DataFrame({"d": e["d"].to_numpy(object), "c": c})
                   .groupby("d", sort=False)["c"].sum().reset_index())
            return frame(agg["d"].to_numpy(object), [""] * len(agg),
                         agg["c"].to_numpy(np.float64), K_RANK,
                         bucket_of(agg["d"].to_numpy(object)))

        def new_ranks(g: pd.DataFrame) -> pd.DataFrame:
            agg = g.groupby("node", sort=False)["val"].sum().reset_index()
            nodes = agg["node"].to_numpy(object)
            return frame(nodes, [""] * len(nodes),
                         floor_next + damping * agg["val"].to_numpy(np.float64),
                         K_RANK, bucket_of(nodes))

        rank_rows = (shares.union(edges_ds.map_batches(
                         edge_rows, batch_format="pyarrow"))
                     .groupby("bucket")
                     .map_groups(contrib_bucket, batch_format="pandas")
                     .groupby("bucket")
                     .map_groups(new_ranks, batch_format="pandas")
                     .materialize())

    # final: fill nodes absent from the last rank table with the floor
    floor_last = floor

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        deg = g[g["kind"] == K_DEG].set_index("node")["val"]
        rnk = g[g["kind"] == K_RANK].set_index("node")["val"] \
            .reindex(deg.index, fill_value=floor_last)
        return pd.DataFrame({"node": deg.index.to_numpy(object),
                             "rank": rnk.to_numpy(np.float64)})

    return (degree_rows.union(rank_rows)
            .groupby("bucket")
            .map_groups(finalize, batch_format="pandas"))
