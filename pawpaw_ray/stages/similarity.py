"""Similarity search over an embedding column (``list<float>``).

Brute-force cosine top-k as the correctness baseline: the query matrix is
broadcast (``ray.put`` once), every batch does one float64 matmul against
it, emits per-batch partial top-k rows, and a final tiny reduce merges the
partials.  The scale path (LSH variants) fuses signature → probe-filter →
scoring into the same single streaming pass.

All stages are task pools with per-worker-process cached state (the state
— plane matrices, query matrix, probe set — costs microseconds to
milliseconds to build/deserialize, so actor pools would add spin-up
latency for nothing; the cache keys on the broadcast ref so each worker
process deserializes exactly once).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# per-worker-process broadcast-state cache (same pattern as stages/link.py).
# Keys embed one-shot ObjectRef ids, so old entries can never hit again —
# bound the dict or every query leaks a dead matrix in every worker.
_STATE_CACHE: dict = {}
_STATE_CACHE_MAX = 4


def _cached_state(key, builder):
    inst = _STATE_CACHE.get(key)
    if inst is None:
        while len(_STATE_CACHE) >= _STATE_CACHE_MAX:
            _STATE_CACHE.pop(next(iter(_STATE_CACHE)))
        inst = _STATE_CACHE[key] = builder()
    return inst


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
    """Per-batch brute-force cosine scores against a broadcast query
    matrix, emitting partial top-k candidate rows."""

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
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
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


def _make_cosine_topk_fn(qref, k: int, id_col: str, vec_col: str):
    key = ("cosine_topk", qref.hex(), k, id_col, vec_col)

    def cosine_topk_batch(batch: pa.Table) -> pa.Table:
        inst = _cached_state(key, lambda: CosineTopK(qref, k, id_col, vec_col))
        return inst(batch)

    return cosine_topk_batch


def _fetch_queries(embeddings_ds, query_ids, id_col, vec_col) -> np.ndarray:
    """Tiny filtered scan for the query vectors, in query-id order."""
    import pyarrow.compute as pc

    id_set = pa.array(query_ids, pa.int64())
    qtab = (embeddings_ds
            .map_batches(lambda b: b.filter(pc.is_in(b[id_col], value_set=id_set)),
                         batch_format="pyarrow")
            .to_pandas()
            .set_index(id_col).loc[list(query_ids)])
    return np.stack(qtab[vec_col].to_numpy()).astype(np.float64)


def _merge_partials(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    out = []
    for qid, g in partials.groupby("query_id", sort=True):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g)
    return pd.concat(out, ignore_index=True)


def ann_topk(embeddings_ds, query_ids: list[int], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> pd.DataFrame:
    """Exact cosine top-k of each query id against the whole table.

    Returns (query_id, vec_id, sim, rank) with deterministic ordering
    (sim desc, vec_id asc).  The query vectors are looked up first (tiny
    filtered read), broadcast once, then one streaming pass scores all rows.
    """
    import ray

    Q = _fetch_queries(embeddings_ds, query_ids, id_col, vec_col)
    qref = ray.put({"ids": list(query_ids), "matrix": Q})

    partials = embeddings_ds.map_batches(
        _make_cosine_topk_fn(qref, k, id_col, vec_col),
        batch_format="pyarrow", batch_size=4096).to_pandas()
    return _merge_partials(partials, k)


# ---------------------------------------------------------------------------
# LSH-bucketed variants — the 100 TB scale path
# ---------------------------------------------------------------------------

def _hyperplanes(n_bits: int, dim: int, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_bits, dim))


def _hyperplanes_mt(n_bits: int, dim: int, n_tables: int,
                    seed: int = 11) -> np.ndarray:
    """(n_tables, n_bits, dim) plane tensor; table 0 equals
    ``_hyperplanes(n_bits, dim, seed)`` (same RNG stream prefix), so
    ``n_tables=1`` reproduces the single-table operator exactly."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_tables * n_bits, dim)).reshape(
        n_tables, n_bits, dim)


def _signs_to_codes(signs: np.ndarray) -> np.ndarray:
    """(n, bits) bool → uint64 codes."""
    weights = (1 << np.arange(signs.shape[1], dtype=np.uint64))
    return (signs.astype(np.uint64) @ weights).astype(np.uint64)


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


class _LshProbeScorer:
    """Fused sign → probe-filter → score state: per batch, one matmul
    against the plane matrix decides candidacy, the surviving rows get the
    cosine scoring — a single streaming pass, nothing materialized."""

    def __init__(self, state_ref, k: int, id_col: str, vec_col: str):
        import ray
        s = ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
        self.H = s["H"]  # (n_tables, n_bits, dim)
        self.wanted = s["wanted"]  # per-table sorted uint64 probe codes
        self.scorer = CosineTopK({"ids": s["ids"], "matrix": s["matrix"]},
                                 k, id_col, vec_col)
        self.vec_col = vec_col

    def _candidate_mask(self, M: np.ndarray) -> np.ndarray:
        # one fused matmul for all tables, then per-table membership OR
        L, bits, dim = self.H.shape
        signs = (M @ self.H.reshape(L * bits, dim).T) > 0
        mask = np.zeros(len(M), dtype=bool)
        for t in range(L):
            codes = _signs_to_codes(signs[:, t * bits:(t + 1) * bits])
            mask |= np.isin(codes, self.wanted[t])
        return mask

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # _to_matrix can't reshape an empty block
            return self.scorer(batch)
        M = _to_matrix(batch[self.vec_col])
        return self.scorer(batch.filter(pa.array(self._candidate_mask(M))))


def ann_topk_lsh(embeddings_ds, query_ids: list[int], k: int = 10,
                 n_bits: int = 8, probe_radius: int = 2,
                 n_tables: int = 1,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int | None = None) -> pd.DataFrame:
    """Approximate top-k: score only rows whose hyperplane code lies within
    Hamming ``probe_radius`` of a query's code in ANY of the ``n_tables``
    independent tables (multi-probe, multi-table LSH).

    Batch-probe semantics: ONE shared candidate scan — the union of every
    query's Hamming ball across tables — is scored against every query (a
    candidate probed for query A is eligible for query B's top-k too; with
    per-query balls the scan would repeat per query for strictly less
    recall).

    Selectivity vs recall: expected scan fraction ≈
    ``n_tables * n_queries * sum_{i<=r} C(n_bits, i) / 2^n_bits``; recall
    per genuinely-near neighbor (bit-flip prob p = θ/π) ≈
    ``1 - (1 - BinomCDF(r; n_bits, p))^n_tables``.  16 bits / radius 2 /
    4 tables scans ~1-5% of a table while keeping ~0.99 recall at cosine
    ≥0.9 — the 100 TB configuration; narrow codes (6 bits) degenerate to
    a ~35% scan.

    Scale path: signature, probe filter and scoring are fused into one
    streaming map over the table.  Recall < 1 by construction — the
    brute-force :func:`ann_topk` is the correctness baseline;
    tests/test_neardup gate recall@k against it on fixture embeddings.
    """
    import ray

    Q = _fetch_queries(embeddings_ds, query_ids, id_col, vec_col)
    dim = dim or Q.shape[1]
    H = _hyperplanes_mt(n_bits, dim, n_tables)
    wanted = []
    for t in range(n_tables):
        q_codes_t = _signs_to_codes((Q @ H[t].T) > 0)
        wanted.append(_probe_codes(q_codes_t, n_bits, probe_radius))
    q_codes = _signs_to_codes((Q @ H[0].T) > 0)  # table-0 codes (output col)

    sref = ray.put({"ids": list(query_ids), "matrix": Q, "H": H,
                    "wanted": wanted})
    key = ("lsh_probe", sref.hex(), k, id_col, vec_col)

    def probe_score_batch(batch: pa.Table) -> pa.Table:
        inst = _cached_state(
            key, lambda: _LshProbeScorer(sref, k, id_col, vec_col))
        return inst(batch)

    partials = embeddings_ds.map_batches(
        probe_score_batch, batch_format="pyarrow", batch_size=4096).to_pandas()

    out = _merge_partials(partials, k)
    code_of = dict(zip(query_ids, q_codes.tolist()))
    out["lsh_code"] = np.asarray([code_of[q] for q in out["query_id"]],
                                 dtype=np.uint64)
    return out


# ---------------------------------------------------------------------------
# IVF-bucketed variant — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

def _kmeans_lite(X: np.ndarray, n_lists: int, n_iter: int = 8,
                 seed: int = 7) -> np.ndarray:
    """Deterministic spherical k-means over a bounded, pre-normalized
    training sample (cosine == dot).  Seeded init, empty lists keep their
    previous centroid; a handful of Lloyd iterations is the standard IVF
    coarse quantizer — list quality only shifts the recall/scan tradeoff,
    never correctness (survivors are exactly re-scored)."""
    rng = np.random.RandomState(seed)
    n_lists = min(n_lists, len(X))
    C = X[rng.choice(len(X), size=n_lists, replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(n_lists):
            m = assign == j
            if m.any():
                v = X[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    C[j] = v / nv
    return C


class _IvfProbeScorer:
    """Fused assign → probe-filter → score state: per batch, one matmul
    against the centroid matrix assigns each row to its inverted list;
    rows whose list is probed by ANY query get the cosine scoring — a
    single streaming pass, no materialized inverted index (at rest the
    assignment would be a persisted partition column; here it is cheaper
    to recompute than to shuffle)."""

    def __init__(self, state_ref, k: int, id_col: str, vec_col: str):
        import ray
        s = ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
        self.C = s["C"]  # (n_lists, dim) unit centroids
        self.wanted = s["wanted"]  # sorted probed list ids (union over queries)
        self.scorer = CosineTopK({"ids": s["ids"], "matrix": s["matrix"]},
                                 k, id_col, vec_col)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # _to_matrix can't reshape an empty block
            return self.scorer(batch)
        M = _normalize(_to_matrix(batch[self.vec_col]))
        assign = np.argmax(M @ self.C.T, axis=1)
        return self.scorer(batch.filter(pa.array(np.isin(assign, self.wanted))))


def ann_topk_ivf(embeddings_ds, query_ids: list[int], k: int = 10,
                 n_lists: int = 64, n_probe: int = 4,
                 train_size: int = 10_000, seed: int = 7,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_rows: int | None = None) -> pd.DataFrame:
    """Approximate top-k via an IVF coarse quantizer: k-means centroids
    from a bounded training sample partition the space into ``n_lists``
    inverted lists; only rows in the ``n_probe`` lists nearest to any
    query are scored.

    Batch-probe semantics match :func:`ann_topk_lsh`: ONE shared candidate
    scan — the union of every query's probed lists — is scored against
    every query.  Expected scan fraction ≈ |union| / n_lists (≤
    n_queries * n_probe / n_lists).

    Scale shape: the training pull is a deterministic splitmix64 id-hash
    sample BOUNDED at ~``train_size`` rows regardless of table size (block
    order never affects it), k-means runs on that sample only, and the
    scan is one fused streaming map — the table is never shuffled, indexed
    or materialized.  The query vectors ride the same filtered pull as the
    training sample, so the operator makes exactly TWO passes over the
    table: one tiny filtered pull, one probe-scoring scan.  For a
    file-backed input ``count()`` is parquet metadata; for a COMPUTED
    input it would execute the lineage a third time — pass ``n_rows`` (or
    materialize upstream) in that case, cf. the size-gate note in
    ``dedup._lsh_pairs``.  Recall < 1 by construction; :func:`ann_topk`
    is the exact baseline and tests gate recall@k against it.
    """
    import pyarrow.compute as pc
    import ray

    from pawpaw_ray.stages.dedup import _splitmix64

    n_rows = embeddings_ds.count() if n_rows is None else n_rows
    mod = max(1, n_rows // train_size)
    qid_set = pa.array(list(query_ids), pa.int64())

    def train_or_query_filter(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64).view(np.uint64)
        keep = _splitmix64(ids) % np.uint64(mod) == 0
        keep |= pc.is_in(b[id_col], value_set=qid_set).to_numpy(
            zero_copy_only=False)
        return b.filter(pa.array(keep))

    pulled = (embeddings_ds
              .map_batches(train_or_query_filter, batch_format="pyarrow")
              .to_pandas()
              .sort_values(id_col))  # block-order-free determinism
    ids_u64 = pulled[id_col].to_numpy(np.int64).view(np.uint64)
    train = pulled[_splitmix64(ids_u64) % np.uint64(mod) == 0]
    X = _normalize(np.stack(train[vec_col].to_numpy()).astype(np.float64))
    C = _kmeans_lite(X, n_lists, seed=seed)

    Q = np.stack(pulled.set_index(id_col)[vec_col]
                 .loc[list(query_ids)].to_numpy()).astype(np.float64)
    Qn = _normalize(Q)
    n_probe = min(n_probe, C.shape[0])
    probes = np.argpartition(-(Qn @ C.T), n_probe - 1, axis=1)[:, :n_probe]
    wanted = np.unique(probes)

    sref = ray.put({"ids": list(query_ids), "matrix": Q, "C": C,
                    "wanted": wanted})
    key = ("ivf_probe", sref.hex(), k, id_col, vec_col)

    def probe_score_batch(batch: pa.Table) -> pa.Table:
        inst = _cached_state(
            key, lambda: _IvfProbeScorer(sref, k, id_col, vec_col))
        return inst(batch)

    partials = embeddings_ds.map_batches(
        probe_score_batch, batch_format="pyarrow", batch_size=4096).to_pandas()
    out = _merge_partials(partials, k)
    list_of = dict(zip(query_ids, np.argmax(Qn @ C.T, axis=1).tolist()))
    out["ivf_list"] = np.asarray([list_of[q] for q in out["query_id"]],
                                 dtype=np.int64)
    return out


class MultiTableSigner:
    """L independent hyperplane signatures per row — one output row per
    (table, code).  Multiple tables are the standard recall fix for cosine
    LSH (P[pair shares >=1 table] = 1-(1-p^bits)^L).  The plane tensor is
    derived from the seed on the first batch (dim read off the data — no
    separate dim-sniffing pass) and identical in every worker."""

    def __init__(self, n_bits: int, n_tables: int = 8, seed: int = 11,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_buckets: int = 64):
        self.n_bits = n_bits
        self.n_tables = n_tables
        self.seed = seed
        self.H: np.ndarray | None = None
        self.id_col = id_col
        self.vec_col = vec_col
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            # empty block: emit the output schema without touching H (an
            # empty FIRST batch must not poison the lazily-derived planes)
            vecs = batch[self.vec_col]
            if isinstance(vecs, pa.ChunkedArray):
                vecs = vecs.combine_chunks()
            return pa.table({
                self.id_col: pa.array([], pa.int64()),
                "lsh_table": pa.array([], pa.int32()),
                "lsh_code": pa.array([], pa.uint64()),
                "bucket": pa.array([], pa.int32()),
                self.vec_col: vecs,
            })
        M = _to_matrix(batch[self.vec_col])
        if self.H is None or self.H.shape[2] != M.shape[1]:
            # (re)derive on first batch OR on a dim change: the per-process
            # state cache keys on config, not data, so a cached signer can
            # outlive one table and see another with a different embedding
            # dim — H is a pure function of (seed, dim), so re-deriving is
            # deterministic and cheap
            rng = np.random.RandomState(self.seed)
            self.H = rng.standard_normal(
                (self.n_tables, self.n_bits, M.shape[1]))
        n = len(M)
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        codes = np.empty((self.n_tables, n), dtype=np.uint64)
        for t in range(self.n_tables):
            codes[t] = _signs_to_codes((M @ self.H[t].T) > 0)
        table_ids = np.repeat(np.arange(self.n_tables, dtype=np.int32), n)
        flat_codes = codes.reshape(-1)
        # cluster-sized shuffle bucket over (table, code): one partition per
        # bucket instead of one tiny sort-group per distinct code
        bucket = ((flat_codes ^ (table_ids.astype(np.uint64)
                                 * np.uint64(0x9E3779B97F4A7C15)))
                  % np.uint64(self.n_buckets)).astype(np.int32)
        vecs = batch[self.vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        vec_rep = pa.concat_arrays([vecs] * self.n_tables)
        return pa.table({
            self.id_col: pa.array(np.tile(ids, self.n_tables), pa.int64()),
            "lsh_table": pa.array(table_ids, pa.int32()),
            "lsh_code": pa.array(flat_codes, pa.uint64()),
            "bucket": pa.array(bucket, pa.int32()),
            self.vec_col: vec_rep,
        })


def _cosine_bucket_pairs(g: pd.DataFrame, threshold: float,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         max_all_pairs: int = 512,
                         chunk: int = 8192) -> pd.DataFrame:
    """Cosine-verified pairs inside the (table, code) groups of one shuffle
    bucket.  Groups up to ``max_all_pairs`` members get the exact n×n
    matmul; larger groups fall back to MULTI-hub stars with hubs spread
    across the sorted id range and a CHUNKED hubs-vs-all matmul, so both
    the similarity matrix (≤ h×chunk) and the emitted pair count
    (≤ h·n ≤ max_all_pairs²/2 per group) stay bounded under duplicate skew
    — the same budget pattern as ``dedup._pairs_from_bucket`` /
    ``dedup._simhash_band_pairs``.  Capped groups are counted via
    ``note_capped_bucket`` (kind ``"embedding_near_dup"``); like the
    simhash path there is no later verification, so a capped HETEROGENEOUS
    group can drop a pair whose members are near each other but below
    threshold against every hub (giant code buckets are near-identical
    vectors in practice — any hub connects the survivors)."""
    from pawpaw_ray.stages.dedup import note_capped_bucket

    # singleton codes can't pair — drop before the per-group loop
    g = g[g.duplicated(["lsh_table", "lsh_code"], keep=False)]
    frames = []
    for _, sub in g.groupby(["lsh_table", "lsh_code"], sort=False):
        sub = sub.drop_duplicates(id_col).sort_values(id_col)
        n = len(sub)
        if n < 2:
            continue
        ids = sub[id_col].to_numpy(np.int64)
        vecs = sub[vec_col].to_numpy()  # object array of per-row vectors
        if n <= max_all_pairs:
            M = _normalize(np.stack(vecs).astype(np.float64))
            S = M @ M.T
            iu, ju = np.triu_indices(n, k=1)
            hit = S[iu, ju] >= threshold
            frames.append(pd.DataFrame(
                {"a": ids[iu[hit]], "b": ids[ju[hit]]}))
            continue
        note_capped_bucket("embedding_near_dup", n, max_all_pairs)
        h = max(1, min(n - 1, max_all_pairs * max_all_pairs // (2 * n)))
        hub_idx = np.unique(np.linspace(0, n - 1, h).astype(np.int64))
        H = _normalize(np.stack(vecs[hub_idx]).astype(np.float64))
        a_parts, b_parts = [], []
        for s0 in range(0, n, chunk):
            s1 = min(n, s0 + chunk)
            Mc = _normalize(np.stack(vecs[s0:s1]).astype(np.float64))
            hi, cj = np.nonzero(H @ Mc.T >= threshold)
            a = ids[hub_idx[hi]]
            b = ids[s0 + cj]
            keep = a != b
            a_parts.append(np.minimum(a, b)[keep])
            b_parts.append(np.maximum(a, b)[keep])
        frames.append(pd.DataFrame({"a": np.concatenate(a_parts),
                                    "b": np.concatenate(b_parts)})
                      .drop_duplicates(ignore_index=True))
    if not frames:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64)})
    return pd.concat(frames, ignore_index=True)


def embedding_near_dup(embeddings_ds, threshold: float = 0.9,
                       n_bits: int = 10, n_tables: int = 8,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       max_all_pairs: int = 512) -> pd.DataFrame:
    """Embedding-cosine near-duplicate clusters.

    L-table hyperplane-LSH bucket groupby → exact pairwise cosine INSIDE
    each (table, code) group (vectorized, hub-capped, chunked matmul —
    see :func:`_cosine_bucket_pairs`) → distributed min-label connected
    components (:mod:`pawpaw_ray.stages.cc`).  The shuffle routes through
    a cluster-sized bucket column; only (id, table, code, vec) rows move,
    and pairs above ``threshold`` are a tiny output whose cross-table
    duplicates collapse in one small aggregate before CC.  ``n_tables``
    trades shuffle volume for recall (single-table single-probe recall
    was the round-1 weak spot).

    Lineage discipline: the input executes exactly ONCE (the signing
    pass).  The signature table is materialized, the small/large gate
    reads its ``size_bytes()`` metadata (no ``count()``/``take()`` sniff
    that would re-execute a computed upstream), and the id universe for
    singleton cluster labels is recovered from the table-0 signature rows
    rather than a second scan of the input.

    Shuffle-volume note: each vector crosses the shuffle ``n_tables``
    times (L·n·d·4 bytes — vectors stay float32 end-to-end).  The
    alternative — ship (id, table, code) only, then hash-JOIN vectors
    onto the candidate pairs for verification — moves 2·P·d·4 bytes for
    P code-colliding pairs, i.e. it wins only when the average bucket
    yields < L/2 partners per row; at the operating point of near-dup
    LSH (buckets small but pairing — that is the point of the banding)
    P ≥ L·n/2, so the per-table vector shuffle is the cheaper design,
    not a shortcut.  The quadratic-P failure mode of the join variant
    on duplicate-heavy corpora is also absent here: in-bucket cosine is
    a bounded matmul and false-positive pairs never cross a shuffle.
    """
    import pyarrow.compute as pc

    from pawpaw_ray.stages.cc import cc_labels_pandas
    from pawpaw_ray.stages.dedup import _dedup_pairs
    from pawpaw_ray.tuning import shuffle_buckets

    signer_kwargs = {"n_bits": n_bits, "n_tables": n_tables,
                     "id_col": id_col, "vec_col": vec_col,
                     "n_buckets": shuffle_buckets()}
    key = ("mt_signer", *sorted(signer_kwargs.items()))

    def sign_batch(batch: pa.Table) -> pa.Table:
        inst = _cached_state(key, lambda: MultiTableSigner(**signer_kwargs))
        return inst(batch)

    # materialized: the groupby (large path) or repartition(1) (small path)
    # would materialize it anyway, and it makes the size gate and the id
    # recovery below metadata/cached-block reads instead of re-executions
    signed = (embeddings_ds
              .map_batches(sign_batch, batch_format="pyarrow")
              .materialize())

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _cosine_bucket_pairs(g, threshold, id_col, vec_col,
                                    max_all_pairs)

    # size gate in BYTES, not rows (cf. dedup._lsh_pairs): every signed row
    # carries a full vector copy, so 768-dim floats hit the limit ~100x
    # sooner than 8-dim ones.  size_bytes() on the materialized table is
    # block metadata — no extra pass.
    if signed.size_bytes() <= 256 * 2**20:
        pairs = signed.repartition(1).map_batches(
            lambda g: bucket_pairs(g).drop_duplicates(),
            batch_format="pandas", batch_size=None)
    else:
        pairs = _dedup_pairs(
            signed.groupby("bucket").map_groups(bucket_pairs,
                                                batch_format="pandas"))
    # id universe for singleton labels: table-0 signature rows carry every
    # input id exactly once — a cached-block scan, not an input re-scan
    ids_ds = signed.map_batches(
        lambda b: b.filter(pc.equal(b["lsh_table"], 0)).select([id_col]),
        batch_format="pyarrow")
    return cc_labels_pandas(pairs, ids_ds, id_col)
