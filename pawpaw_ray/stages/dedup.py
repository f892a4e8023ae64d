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
