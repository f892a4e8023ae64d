"""Similarity search over an embedding column (``list<float>``).

Brute-force cosine top-k as the correctness baseline: the query matrix is
broadcast (``ray.put`` once), every batch does one float64 matmul against
it, emits per-batch partial top-k rows, and a final tiny reduce merges the
partials.  The scale path (LSH-bucketed variant) reuses the same per-batch
kernel inside hash buckets of a random-hyperplane signature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix (zero-copy flatten)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class CosineTopK:
    """Actor-pool callable: per-batch brute-force cosine scores against a
    broadcast query matrix, emitting partial top-k candidate rows."""

    def __init__(self, queries_ref, k: int = 10, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        import ray
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.query_ids = np.asarray(q["ids"], dtype=np.int64)
        self.Q = _normalize(np.asarray(q["matrix"], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        M = _normalize(_to_matrix(batch[self.vec_col]))
        sims = M @ self.Q.T  # (n, q)
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for j in range(sims.shape[1]):
            col = sims[:, j]
            top = np.argpartition(-col, k - 1)[:k]
            out_q.extend([int(self.query_ids[j])] * k)
            out_id.extend(ids[top].tolist())
            out_sim.extend(col[top].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "sim": pa.array(out_sim, pa.float64()),
        })


def ann_topk(embeddings_ds, query_ids: list[int], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             concurrency=(1, 8)) -> pd.DataFrame:
    """Exact cosine top-k of each query id against the whole table.

    Returns (query_id, vec_id, sim, rank) with deterministic ordering
    (sim desc, vec_id asc).  The query vectors are looked up first (tiny
    filtered read), broadcast once, then one streaming pass scores all rows.
    """
    import ray
    import pyarrow.compute as pc

    id_set = pa.array(query_ids, pa.int64())
    qtab = (embeddings_ds
            .map_batches(lambda b: b.filter(pc.is_in(b[id_col], value_set=id_set)),
                         batch_format="pyarrow")
            .to_pandas())
    qtab = qtab.set_index(id_col).loc[list(query_ids)]
    queries = {
        "ids": list(query_ids),
        "matrix": np.stack(qtab[vec_col].to_numpy()),
    }
    qref = ray.put(queries)

    partials = embeddings_ds.map_batches(
        CosineTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": k,
                               "id_col": id_col, "vec_col": vec_col},
        batch_format="pyarrow", batch_size=4096, concurrency=concurrency,
    ).to_pandas()

    out = []
    for qid, g in partials.groupby("query_id", sort=True):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g)
    return pd.concat(out, ignore_index=True)


# ---------------------------------------------------------------------------
# LSH-bucketed variants — the 100 TB scale path
# ---------------------------------------------------------------------------

def _hyperplanes(n_bits: int, dim: int, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_bits, dim))


def _signs_to_codes(signs: np.ndarray) -> np.ndarray:
    """(n, bits) bool → uint64 codes."""
    weights = (1 << np.arange(signs.shape[1], dtype=np.uint64))
    return (signs.astype(np.uint64) @ weights).astype(np.uint64)


class HyperplaneSigner:
    """Actor-pool stage: random-hyperplane signature per row.  The plane
    matrix is derived from a seed in ``__init__`` — identical in every actor
    with zero broadcast traffic."""

    def __init__(self, n_bits: int = 16, dim: int = 64, seed: int = 11,
                 vec_col: str = "embedding"):
        self.H = _hyperplanes(n_bits, dim, seed)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _to_matrix(batch[self.vec_col])
        codes = _signs_to_codes((M @ self.H.T) > 0)
        return batch.append_column("lsh_code", pa.array(codes, pa.uint64()))


def ann_topk_lsh(embeddings_ds, query_ids: list[int], k: int = 10,
                 n_bits: int = 8, id_col: str = "vec_id",
                 vec_col: str = "embedding", concurrency=(1, 8)) -> pd.DataFrame:
    """Approximate top-k: score only rows whose hyperplane code matches a
    query's code (single-probe LSH).

    Scale path: the signature pass is a streaming map; only the matching
    buckets are scored.  Recall < 1 by construction — the brute-force
    :func:`ann_topk` is the correctness baseline it trades against.
    """
    import pyarrow.compute as pc
    import ray

    dim = len(embeddings_ds.take(1)[0][vec_col])
    H = _hyperplanes(n_bits, dim)

    id_set = pa.array(query_ids, pa.int64())
    qtab = (embeddings_ds
            .map_batches(lambda b: b.filter(pc.is_in(b[id_col], value_set=id_set)),
                         batch_format="pyarrow")
            .to_pandas()
            .set_index(id_col).loc[list(query_ids)])
    Q = np.stack(qtab[vec_col].to_numpy()).astype(np.float64)
    q_codes = _signs_to_codes((Q @ H.T) > 0)
    wanted = pa.array(np.unique(q_codes), pa.uint64())

    signed = embeddings_ds.map_batches(
        HyperplaneSigner,
        fn_constructor_kwargs={"n_bits": n_bits, "dim": dim, "vec_col": vec_col},
        batch_format="pyarrow", concurrency=concurrency)
    candidates = signed.map_batches(
        lambda b: b.filter(pc.is_in(b["lsh_code"], value_set=wanted)),
        batch_format="pyarrow")

    qref = ray.put({"ids": list(query_ids), "matrix": Q})
    partials = candidates.map_batches(
        CosineTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": k,
                               "id_col": id_col, "vec_col": vec_col},
        batch_format="pyarrow", batch_size=4096, concurrency=concurrency,
    ).to_pandas()

    code_of = dict(zip(query_ids, q_codes.tolist()))
    out = []
    for qid, g in partials.groupby("query_id", sort=True):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["lsh_code"] = np.uint64(code_of[qid])
        out.append(g)
    return pd.concat(out, ignore_index=True)


def embedding_near_dup(embeddings_ds, threshold: float = 0.9,
                       n_bits: int = 10, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       concurrency=(1, 8)) -> pd.DataFrame:
    """Embedding-cosine near-duplicate clusters.

    Hyperplane-LSH bucket groupby → exact pairwise cosine INSIDE each
    bucket (vectorized matmul per group) → min-label connected components.
    Only (id, code, vec) rows move through the shuffle; pairs above
    ``threshold`` are a tiny output.  Single-probe bucketing trades recall
    for a full-table-scan-free plan, same as every production near-dup
    pass; raise ``n_bits`` for precision, lower it for recall.
    """
    signed = embeddings_ds.map_batches(
        HyperplaneSigner,
        fn_constructor_kwargs={"n_bits": n_bits,
                               "dim": len(embeddings_ds.take(1)[0][vec_col]),
                               "vec_col": vec_col},
        batch_format="pyarrow", concurrency=concurrency)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "sim": pd.Series([], dtype=np.float64)})
        ids = g[id_col].to_numpy(np.int64)
        M = _normalize(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        S = M @ M.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = S[iu, ju] >= threshold
        return pd.DataFrame({"a": np.minimum(ids[iu[hit]], ids[ju[hit]]),
                             "b": np.maximum(ids[iu[hit]], ids[ju[hit]]),
                             "sim": S[iu, ju][hit]})

    pairs = (signed.groupby("lsh_code")
             .map_groups(bucket_pairs, batch_format="pandas")
             .to_pandas())
    if "a" not in pairs.columns:  # zero pairs anywhere → empty frame
        pairs = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                              "b": pd.Series([], dtype=np.int64)})

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["a"].tolist(), pairs["b"].tolist()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    all_ids = embeddings_ds.select_columns([id_col]).to_pandas()[id_col]
    return pd.DataFrame({
        id_col: all_ids.to_numpy(np.int64),
        "cluster_id": np.fromiter((find(int(i)) for i in all_ids),
                                  dtype=np.int64, count=len(all_ids)),
    })
