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
* **pinned path** (rank vector too big to ship — the default at that
  size): a fixed pool of B shard ACTORS, each holding its ``hash(node)
  % B`` slice of node state AND its ``hash(src) % B`` slice of the edge
  table, loaded ONCE.  Because src state and src edges share the bucket
  function, shares never travel; after a one-time key handshake the only
  per-iteration traffic is pure float contribution arrays actor→actor
  (receiver-side local-id layouts are cached at setup) plus two scalars
  through the driver.  This is the raw-actor exception the Dataset API
  can't express: mutable per-partition state reused across iterations.
* **co-location Dataset path** (``method="colocated"``): edges and ranks
  are unioned and grouped by ``hash(src) % B`` so each bucket task joins
  its rank rows to its edge rows locally — no broadcast and no actor
  lifetime management, at the cost of re-shuffling the edge table each
  iteration (Ray Datasets keep no persistent partitioning between
  operations).  Kept as the pure-Dataset fallback and differential
  check for the pinned path.

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
             broadcast_bytes: int = 256 * 2**20,
             method: str = "auto", pinned_shards: int | None = None):
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
    if method == "colocated":
        return _pagerank_colocated(edges_ds, degrees_ds, n_nodes,
                                   src_col, dst_col,
                                   damping, n_iter, n_buckets)
    # auto: the pinned path wins whenever its one-time setup (actor pool +
    # key handshake) amortizes over iterations — measured 2.2x at 33k
    # nodes / 411k edges and 7.3x at 200k/2M for 5-6 iterations; the
    # broadcast path's per-iteration sort-shuffle reduce is the cost it
    # avoids.  Broadcast stays for 1-2-iteration runs and as an explicit
    # method; above broadcast_bytes pinned is the only scale-safe choice.
    if method == "pinned" or (method == "auto"
                              and (state_bytes > broadcast_bytes
                                   or n_iter >= 3)):
        return _pagerank_pinned(edges_ds, degrees_ds, n_nodes,
                                src_col, dst_col,
                                damping, n_iter, pinned_shards)
    if method not in ("auto", "broadcast"):
        raise ValueError(f"unknown pagerank method {method!r}")

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


class _PRShard:
    """One PageRank partition: node state for ``hash(node) % B == b`` and
    edge rows for ``hash(src) % B == b`` (same bucket function, so a
    node's rank and its out-edges are always co-resident).  Loaded once;
    per-iteration work is vectorized numpy over arrays sorted at build
    time, and the only cross-shard traffic is float contribution arrays
    whose receiver-side scatter layout was registered during the setup
    handshake."""

    def __init__(self, shard_idx: int, n_shards: int, damping: float):
        self.b = shard_idx
        self.B = n_shards
        self.d = damping
        self._deg_nodes: list[np.ndarray] = []
        self._degs: list[np.ndarray] = []
        self._srcs: list[np.ndarray] = []
        self._dsts: list[np.ndarray] = []
        self.ids_from: dict[int, np.ndarray] = {}

    # ---- load ----
    def add_degrees(self, nodes: np.ndarray, degs: np.ndarray) -> int:
        self._deg_nodes.append(nodes)
        self._degs.append(degs)
        return len(nodes)

    def add_edges(self, srcs: np.ndarray, dsts: np.ndarray) -> int:
        self._srcs.append(srcs)
        self._dsts.append(dsts)
        return len(srcs)

    def build(self) -> int:
        from pawpaw_ray.tuning import hash_bucket

        nodes = (np.concatenate(self._deg_nodes) if self._deg_nodes
                 else np.empty(0, object))
        degs = (np.concatenate(self._degs) if self._degs
                else np.empty(0, np.int64))
        order = np.argsort(nodes, kind="stable")
        self.nodes, self.deg = nodes[order], degs[order]
        self._deg_nodes = self._degs = None
        self.ranks = np.empty(0, np.float64)

        srcs = (np.concatenate(self._srcs) if self._srcs
                else np.empty(0, object))
        dsts = (np.concatenate(self._dsts) if self._dsts
                else np.empty(0, object))
        self._srcs = self._dsts = None
        idx = pd.Index(self.nodes)
        src_local = idx.get_indexer(srcs)
        if (src_local < 0).any():
            raise AssertionError("edge src missing from shard node set")
        tgt = hash_bucket(dsts, self.B).astype(np.int64)
        # sort edges by (target shard, dst key): per-iteration sums are
        # then one reduceat over contiguous (target, dst) groups
        e_order = np.lexsort((dsts, tgt))
        self._src_sorted = src_local[e_order]
        dst_sorted, tgt_sorted = dsts[e_order], tgt[e_order]
        if len(dst_sorted):
            new_grp = np.empty(len(dst_sorted), bool)
            new_grp[0] = True
            new_grp[1:] = ((dst_sorted[1:] != dst_sorted[:-1])
                           | (tgt_sorted[1:] != tgt_sorted[:-1]))
            self._red_starts = np.flatnonzero(new_grp)
            grp_tgt = tgt_sorted[self._red_starts]
            self._grp_dst = dst_sorted[self._red_starts]
            # contiguous per-target group slices
            self._tgt_slices = np.searchsorted(
                grp_tgt, np.arange(self.B + 1))
        else:
            self._red_starts = np.empty(0, np.int64)
            self._grp_dst = np.empty(0, object)
            self._tgt_slices = np.zeros(self.B + 1, np.int64)
        return len(self.nodes)

    def dst_keys(self):
        """Unique dst keys per target shard (the one-time handshake)."""
        return tuple(
            self._grp_dst[self._tgt_slices[t]:self._tgt_slices[t + 1]]
            for t in range(self.B))

    def register_incoming(self, sender: int, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        ids = pd.Index(self.nodes).get_indexer(keys)
        if (ids < 0).any():
            raise AssertionError("dst key missing from its shard node set")
        self.ids_from[sender] = ids

    def init_ranks(self, n_nodes: int) -> None:
        self.n = n_nodes
        self.ranks = np.full(len(self.nodes), 1.0 / n_nodes)

    # ---- per iteration ----
    def dangling(self) -> float:
        return float(self.ranks[self.deg == 0].sum())

    def contrib(self):
        """Per-target summed contributions, aligned to the dst_keys order
        registered at setup — pure float arrays, nothing else travels."""
        share = np.where(self.deg > 0,
                         self.ranks / np.maximum(self.deg, 1), 0.0)
        if len(self._src_sorted) == 0:
            return tuple(np.empty(0, np.float64) for _ in range(self.B))
        sums = np.add.reduceat(share[self._src_sorted], self._red_starts)
        return tuple(sums[self._tgt_slices[t]:self._tgt_slices[t + 1]]
                     for t in range(self.B))

    def apply(self, floor: float, *vals) -> None:
        inc = np.zeros(len(self.nodes))
        for s, v in enumerate(vals):
            ids = self.ids_from.get(s)
            if ids is not None and len(v):
                inc[ids] += v
        self.ranks = floor + self.d * inc

    def result_table(self) -> pa.Table:
        return pa.table({"node": pa.array(self.nodes, pa.string()),
                         "rank": pa.array(self.ranks, pa.float64())})


def _pagerank_pinned(edges_ds, degrees_ds, n_nodes: int, src_col, dst_col,
                     damping, n_iter, n_shards: int | None):
    """Partition-pinned actor path (see module docstring).

    Edges and node state stream from their Datasets straight into the
    shard actors inside ``map_batches`` tasks (the driver never holds a
    row); iterations then touch no Dataset at all — the edge table is
    never re-shuffled, which removes the ``n_iter - 1`` edge exchanges
    the pure-Dataset co-location path pays."""
    import ray
    import ray.data as rd

    from pawpaw_ray.tuning import hash_bucket

    if n_shards is None:
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            ncpu = 8
        n_shards = max(2, min(32, ncpu))
    B = n_shards
    Shard = ray.remote(_PRShard)
    shards = [Shard.remote(b, B, damping) for b in range(B)]

    def consume(ds, route):
        def fn(b: pa.Table) -> pa.Table:
            ray.get(route(b))
            return pa.table({"n": pa.array([len(b)], pa.int64())})
        return ds.map_batches(fn, batch_format="pyarrow").count()

    def route_degrees(b: pa.Table):
        df = b.to_pandas()
        nodes = df["node"].to_numpy(object)
        degs = df["deg"].to_numpy(np.int64)
        buck = hash_bucket(nodes, B)
        return [shards[t].add_degrees.remote(nodes[buck == t],
                                             degs[buck == t])
                for t in np.unique(buck)]

    def route_edges(b: pa.Table):
        df = pa.table({"s": b[src_col], "d": b[dst_col]}).to_pandas()
        s = df["s"].to_numpy(object)
        d = df["d"].to_numpy(object)
        buck = hash_bucket(s, B)
        return [shards[t].add_edges.remote(s[buck == t], d[buck == t])
                for t in np.unique(buck)]

    consume(degrees_ds.drop_columns(["nbucket"]), route_degrees)
    consume(edges_ds, route_edges)
    ray.get([a.build.remote() for a in shards])

    # one-time handshake: receivers cache each sender's dst scatter layout
    key_refs = [a.dst_keys.options(num_returns=B).remote() for a in shards]
    ray.get([shards[t].register_incoming.remote(s, key_refs[s][t])
             for s in range(B) for t in range(B)])
    ray.get([a.init_ranks.remote(n_nodes) for a in shards])

    inv_n = 1.0 / n_nodes
    for _ in range(n_iter):
        dm = sum(ray.get([a.dangling.remote() for a in shards]))
        floor = (1.0 - damping) * inv_n + damping * dm * inv_n
        out = [a.contrib.options(num_returns=B).remote() for a in shards]
        ray.get([shards[t].apply.remote(floor,
                                        *[out[s][t] for s in range(B)])
                 for t in range(B)])

    result = rd.from_arrow_refs(
        [a.result_table.remote() for a in shards]).materialize()
    for a in shards:
        ray.kill(a)
    return result
