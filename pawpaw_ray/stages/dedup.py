"""Deduplication operators over a documents table.

Exact (hash-partition + first-per-group), MinHash+LSH near-dup, SimHash,
and n-gram Jaccard verification — the scale path for each is the bucketed
shuffle pattern (map-side signature computation, shuffle only small
signature rows, never text).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import regex as rx

_TOKEN_RX = rx.compile(r"[A-Za-z0-9_]+")


def _norm_tokens(text: str) -> list[str]:
    return [t.lower() for t in _TOKEN_RX.findall(text or "")]


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_key_batch(batch: pa.Table, text_col: str = "text",
                    n_buckets: int = 64) -> pa.Table:
    """sha1(text) + hash bucket — the shuffle then moves (key, id) rows."""
    keys = [hashlib.sha1((t or "").encode()).hexdigest()
            for t in batch[text_col].to_pylist()]
    bucket = np.fromiter((zlib.crc32(k.encode()) % n_buckets for k in keys),
                         dtype=np.int32, count=len(keys))
    return (batch.append_column("text_sha1", pa.array(keys, pa.string()))
                 .append_column("dbucket", pa.array(bucket, pa.int32())))


def exact_dedup_bucket(g: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """First (min id) per identical text + copy count."""
    g = g.sort_values([("text_sha1"), id_col], kind="mergesort")
    grp = g.groupby("text_sha1", sort=False)
    first = g.drop_duplicates("text_sha1").copy()
    first["n_copies"] = grp.size().to_numpy(np.int64)
    return first


def exact_dedup(docs_ds, text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 64):
    keyed = docs_ds.map_batches(
        lambda b: exact_key_batch(b, text_col, n_buckets), batch_format="pyarrow")
    return (keyed.groupby("dbucket")
            .map_groups(lambda g: exact_dedup_bucket(g, id_col),
                        batch_format="pandas")
            .drop_columns(["dbucket"]))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (uint64)."""
    toks = _norm_tokens(text)
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return np.fromiter(
        (zlib.crc32(g.encode()) for g in grams), dtype=np.uint64, count=len(grams))


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray,
                      k: int = 3) -> np.ndarray:
    sh = shingles(text, k)
    if len(sh) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    # (a*x + b) mod p, min over shingles — vectorized outer product
    vals = (np.multiply.outer(sh.astype(np.uint64), a) + b) % _MERSENNE
    return vals.min(axis=0).astype(np.uint64)


class MinHashLSH:
    """Actor-pool signature stage: permutation params built once per actor.

    Emits one row per (doc, band): ``(band, band_hash, doc_id)`` — the LSH
    bucket key the groupby shuffles on.
    """

    def __init__(self, num_perm: int = 64, bands: int = 8, k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_band, out_hash, out_id = [], [], []
        for i, text in enumerate(texts):
            sig = minhash_signature(text, self.a, self.b, self.k)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                h = hashlib.sha1(chunk.tobytes() + bytes([band])).hexdigest()[:16]
                out_band.append(band)
                out_hash.append(h)
                out_id.append(ids[i])
        return pa.table({
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.string()),
            "doc_id": pa.array(out_id, pa.int64()),
        })


def _pairs_from_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs from one LSH bucket (min-id paired with the rest —
    sufficient for min-label clustering)."""
    ids = np.sort(g["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64)})
    return pd.DataFrame({"a": np.repeat(ids[0], len(ids) - 1), "b": ids[1:]})


def minhash_clusters(docs_ds, num_perm: int = 64, bands: int = 8, k: int = 3,
                     id_col: str = "doc_id", text_col: str = "text",
                     concurrency=(1, 8)) -> pd.DataFrame:
    """MinHash-LSH near-dup clustering.

    Returns a pandas DataFrame ``(doc_id, cluster_id)`` where cluster_id is
    the min doc_id of the connected component.  The signature scan is the
    heavy distributed stage; candidate pairs are a tiny fraction and the
    final union-find runs driver-side (documented small-side assumption —
    at extreme scale replace with iterative min-label propagation rounds).
    """
    bands_ds = docs_ds.map_batches(
        MinHashLSH, fn_constructor_kwargs={
            "num_perm": num_perm, "bands": bands, "k": k,
            "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency)
    pairs = (bands_ds.groupby(["band", "band_hash"])
             .map_groups(_pairs_from_bucket, batch_format="pandas")
             .to_pandas())

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

    all_ids = docs_ds.select_columns([id_col]).to_pandas()[id_col]
    return pd.DataFrame({
        "doc_id": all_ids.to_numpy(np.int64),
        "cluster_id": np.fromiter((find(int(i)) for i in all_ids),
                                  dtype=np.int64, count=len(all_ids)),
    })


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    toks = _norm_tokens(text)
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for t in toks:
        h = np.uint64(int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= (1 << i)
    return out


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = [simhash64(t) for t in batch[text_col].to_pylist()]
    return batch.append_column("simhash64", pa.array(vals, pa.uint64()))


# ---------------------------------------------------------------------------
# n-gram Jaccard (verification kernel for near-dup candidates)
# ---------------------------------------------------------------------------

def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(shingles(text_a, k).tolist()), set(shingles(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def _cluster_pairs(pairs_a, pairs_b, all_ids) -> pd.DataFrame:
    """Min-label connected components from verified pairs (driver-side —
    pairs are a tiny fraction; at extreme scale replace with iterative
    min-label propagation rounds)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs_a, pairs_b):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return pd.DataFrame({
        "doc_id": np.asarray(all_ids, dtype=np.int64),
        "cluster_id": np.fromiter((find(int(i)) for i in all_ids),
                                  dtype=np.int64, count=len(all_ids)),
    })


def near_dup_jaccard(docs_ds, threshold: float = 0.8, num_perm: int = 64,
                     bands: int = 8, k: int = 3, id_col: str = "doc_id",
                     text_col: str = "text", concurrency=(1, 8)) -> pd.DataFrame:
    """MinHash-LSH candidates VERIFIED by exact n-gram Jaccard ≥ threshold.

    The LSH pass bounds candidate pairs; verification fetches only the
    candidate documents' texts (filtered read, broadcast once) and runs the
    set-overlap kernel distributed over the pair list.  Output:
    (doc_id, cluster_id) like :func:`minhash_clusters`, but without LSH
    false positives.
    """
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    bands_ds = docs_ds.map_batches(
        MinHashLSH, fn_constructor_kwargs={
            "num_perm": num_perm, "bands": bands, "k": k,
            "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency)
    pairs = (bands_ds.groupby(["band", "band_hash"])
             .map_groups(_pairs_from_bucket, batch_format="pandas")
             .to_pandas())
    if "a" not in pairs.columns:  # zero candidate pairs anywhere
        pairs = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                              "b": pd.Series([], dtype=np.int64)})
    pairs = pairs.drop_duplicates(["a", "b"])

    all_ids = docs_ds.select_columns([id_col]).to_pandas()[id_col]
    if not len(pairs):
        return _cluster_pairs([], [], all_ids)

    cand_ids = pa.array(np.unique(np.concatenate(
        [pairs["a"].to_numpy(np.int64), pairs["b"].to_numpy(np.int64)])))
    cand = (docs_ds.map_batches(
                lambda b: b.filter(pc.is_in(b[id_col], value_set=cand_ids)),
                batch_format="pyarrow")
            .to_pandas())
    texts_ref = ray.put(dict(zip(cand[id_col], cand[text_col])))

    def verify(b: pa.Table) -> pa.Table:
        lut = ray.get(texts_ref)
        aa = b["a"].to_pylist()
        bb = b["b"].to_pylist()
        sims = [jaccard(lut.get(x, ""), lut.get(y, ""), k) for x, y in zip(aa, bb)]
        keep = pa.array([s >= threshold for s in sims], pa.bool_())
        return b.append_column("jaccard", pa.array(sims, pa.float64())).filter(keep)

    verified = (rd.from_pandas(pairs.reset_index(drop=True))
                .map_batches(verify, batch_format="pyarrow")
                .to_pandas())
    return _cluster_pairs(verified["a"].tolist(), verified["b"].tolist(), all_ids)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_clusters(docs_ds, max_hamming: int = 3, id_col: str = "doc_id",
                     text_col: str = "text") -> pd.DataFrame:
    """SimHash near-dup: band the 64-bit signature into 4 x 16-bit keys
    (any pair within Hamming distance 3 shares at least one exact band by
    pigeonhole), bucket-groupby per band, verify Hamming ≤ ``max_hamming``
    inside buckets, then min-label clusters."""

    def sig_batch(b: pa.Table) -> pa.Table:
        sigs = [simhash64(t) for t in b[text_col].to_pylist()]
        out_id, out_band, out_key, out_sig = [], [], [], []
        for i, s in enumerate(sigs):
            for band in range(4):
                out_id.append(b[id_col][i].as_py())
                out_band.append(band)
                out_key.append((s >> (band * 16)) & 0xFFFF)
                out_sig.append(s)
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_key": pa.array(out_key, pa.uint64()),
            "simhash64": pa.array(out_sig, pa.uint64()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy(np.int64)
        sigs = g["simhash64"].to_numpy(np.uint64)
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if hamming64(int(sigs[i]), int(sigs[j])) <= max_hamming:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"a": pd.Series(out_a, dtype=np.int64),
                             "b": pd.Series(out_b, dtype=np.int64)})

    pairs = (docs_ds.map_batches(sig_batch, batch_format="pyarrow")
             .groupby(["band", "band_key"])
             .map_groups(bucket_pairs, batch_format="pandas")
             .to_pandas())
    if "a" not in pairs.columns:  # zero candidate pairs anywhere
        pairs = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                              "b": pd.Series([], dtype=np.int64)})
    pairs = pairs.drop_duplicates(["a", "b"])
    all_ids = docs_ds.select_columns([id_col]).to_pandas()[id_col]
    return _cluster_pairs(pairs["a"].tolist(), pairs["b"].tolist(), all_ids)
