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
