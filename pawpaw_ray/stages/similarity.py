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


def _sniff_dim(embeddings_ds, vec_col: str) -> int:
    """Vector width from the first row (limit-pushdown read of one
    row-group; callers that know the width pass ``dim=`` and skip this)."""
    return len(embeddings_ds.take(1)[0][vec_col])


def _probe_codes(q_codes: np.ndarray, n_bits: int, radius: int) -> np.ndarray:
    """Multi-probe expansion: every code within Hamming ``radius`` of any
    query code.  Single-probe hyperplane LSH has poor recall on
    structure-free embeddings (a near neighbor crosses ~θ/π of the planes);
    probing the Hamming ball recovers it at the cost of scanning
    sum_{i<=r} C(n_bits, i) / 2^n_bits of the table."""
    from itertools import combinations

    masks = [np.uint64(0)]
    for r in range(1, radius + 1):
        for bits in combinations(range(n_bits), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(np.uint64(m))
    expanded = (q_codes[:, None].astype(np.uint64)
                ^ np.asarray(masks, dtype=np.uint64)[None, :])
    return np.unique(expanded)


def ann_topk_lsh(embeddings_ds, query_ids: list[int], k: int = 10,
                 n_bits: int = 8, probe_radius: int = 2,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int | None = None, concurrency=(1, 8)) -> pd.DataFrame:
    """Approximate top-k: score only rows whose hyperplane code lies within
    Hamming ``probe_radius`` of a query's code (multi-probe LSH).

    Batch-probe semantics: ONE shared candidate scan — the union of every
    query's Hamming ball — is scored against every query (a candidate probed
    for query A is eligible for query B's top-k too; with per-query balls
    the scan would repeat per query for strictly less recall).

    Scale path: the signature pass is a streaming map; only the probed
    buckets are scored.  Recall < 1 by construction — the brute-force
    :func:`ann_topk` is the correctness baseline; tests/test_neardup gate
    recall@k against it on the fixture embeddings.
    """
    import pyarrow.compute as pc
    import ray

    dim = dim or _sniff_dim(embeddings_ds, vec_col)
    H = _hyperplanes(n_bits, dim)

    id_set = pa.array(query_ids, pa.int64())
    qtab = (embeddings_ds
            .map_batches(lambda b: b.filter(pc.is_in(b[id_col], value_set=id_set)),
                         batch_format="pyarrow")
            .to_pandas()
            .set_index(id_col).loc[list(query_ids)])
    Q = np.stack(qtab[vec_col].to_numpy()).astype(np.float64)
    q_codes = _signs_to_codes((Q @ H.T) > 0)
    wanted = pa.array(_probe_codes(q_codes, n_bits, probe_radius), pa.uint64())

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


class MultiTableSigner:
    """Actor-pool stage: L independent hyperplane signatures per row — one
    output row per (table, code).  Multiple tables are the standard recall
    fix for cosine LSH (P[pair shares >=1 table] = 1-(1-p^bits)^L); the
    plane tensor is seed-derived in ``__init__``, zero broadcast traffic."""

    def __init__(self, n_bits: int, dim: int, n_tables: int = 8,
                 seed: int = 11, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.H = rng.standard_normal((n_tables, n_bits, dim))
        self.n_tables = n_tables
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _to_matrix(batch[self.vec_col])
        n = len(M)
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        codes = np.empty((self.n_tables, n), dtype=np.uint64)
        for t in range(self.n_tables):
            codes[t] = _signs_to_codes((M @ self.H[t].T) > 0)
        table_ids = np.repeat(np.arange(self.n_tables, dtype=np.int32), n)
        vecs = batch[self.vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        vec_rep = pa.concat_arrays([vecs] * self.n_tables)
        return pa.table({
            self.id_col: pa.array(np.tile(ids, self.n_tables), pa.int64()),
            "lsh_table": pa.array(table_ids, pa.int32()),
            "lsh_code": pa.array(codes.reshape(-1), pa.uint64()),
            self.vec_col: vec_rep,
        })


def embedding_near_dup(embeddings_ds, threshold: float = 0.9,
                       n_bits: int = 10, n_tables: int = 8,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       dim: int | None = None,
                       concurrency=(1, 8)) -> pd.DataFrame:
    """Embedding-cosine near-duplicate clusters.

    L-table hyperplane-LSH bucket groupby → exact pairwise cosine INSIDE
    each bucket (vectorized matmul per group) → distributed min-label
    connected components (:mod:`pawpaw_ray.stages.cc`).  Only
    (id, table, code, vec) rows move through the shuffle; pairs above
    ``threshold`` are a tiny output and duplicates across tables collapse
    in one small aggregate.  ``n_tables`` trades shuffle volume for recall
    (single-table single-probe recall was the round-1 weak spot).
    """
    from pawpaw_ray.stages.cc import cc_labels_pandas
    from pawpaw_ray.stages.dedup import _dedup_pairs

    signed = embeddings_ds.map_batches(
        MultiTableSigner,
        fn_constructor_kwargs={
            "n_bits": n_bits, "dim": dim or _sniff_dim(embeddings_ds, vec_col),
            "n_tables": n_tables, "id_col": id_col, "vec_col": vec_col},
        batch_format="pyarrow", concurrency=concurrency)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col)
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        ids = g[id_col].to_numpy(np.int64)
        M = _normalize(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        S = M @ M.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = S[iu, ju] >= threshold
        return pd.DataFrame({"a": np.minimum(ids[iu[hit]], ids[ju[hit]]),
                             "b": np.maximum(ids[iu[hit]], ids[ju[hit]])})

    pairs = _dedup_pairs(
        signed.groupby(["lsh_table", "lsh_code"])
        .map_groups(bucket_pairs, batch_format="pandas"))
    out = cc_labels_pandas(pairs, embeddings_ds.select_columns([id_col]),
                           id_col)
    return out
