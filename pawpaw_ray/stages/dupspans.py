"""Exact duplicated-substring span detection (character-level).

The substring-dedup building block from "Deduplicating Training Data Makes
Language Models Better" (Lee et al., 2022): find every maximal character
span whose ``k``-char windows each occur at least twice ANYWHERE in the
corpus (within the same document or across documents) — the spans a
curation pipeline masks or cuts before training.  Engine-new: the reference
has no corpus-level operator family (its unique axis ``'><'`` is
per-iterator; ``/root/reference/pawpaw/query/_query.py:173-177``).

Semantics (fixed so a SQL oracle can replay them exactly):

* a *position* is a 0-based char offset ``p`` with ``p + k <= len(text)``;
* position ``p`` of doc ``d`` is *duplicated* iff the exact k-char window
  ``text[p:p+k]`` occurs at >= 2 positions corpus-wide;
* output = per-doc union of the intervals ``[p, p+k)`` over duplicated
  positions, merged while they overlap or touch — rows
  ``(doc_id, span_start, span_end)`` with ``span_end`` exclusive.

Scale shape — four bucketed shuffles, no broadcast, no driver state:

1. one corpus scan emits ``(h, doc, pos)`` per position, where ``h`` is a
   Rabin-Karp rolling hash (odd multiplier, mod 2^64) computed with O(n)
   vectorized prefix sums over the batch's concatenated code points — no
   (positions x k) window matrix, no per-window Python loop;
2. groupby ``h % B``: positions whose hash appears >= 2 times survive as
   *candidates* (hash collisions only ADD candidates; step 4 removes them);
3. candidates meet their document text in a doc-bucketed groupby (the
   same union-of-kinds single-shuffle pattern as the co-located PageRank
   state) and slice out the real k-char gram — grams are materialized
   ONLY for candidate positions, never for the whole corpus;
4. groupby ``siphash(gram) % B`` keeps grams with a true global count
   >= 2 (exact verification — the output is hash-free), then a final
   doc-bucketed groupby sorts each doc's verified positions and merges
   them into maximal spans with one vectorized diff/cumsum pass.

Shuffle volume: step 2 moves ~24 bytes per corpus character — the inherent
cost of EXACT all-duplicate detection (a distributed suffix array moves the
corpus a comparable number of times); steps 3-4 move only the duplicated
fraction plus one pass of the document text.  For an approximate cheap
pass, ``sample_mod > 1`` winnows step 2 to positions with
``h % sample_mod == 0`` (detects duplicate runs of length
>= k + sample_mod - 1 with the standard winnowing guarantee) — the oracle
contract below holds only for the exact default.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pawpaw_ray.tuning import hash_bucket

# odd => invertible mod 2^64; the golden-ratio constant used by the
# splitmix64 family elsewhere in the engine (stages/dedup.py).
_P = np.uint64(0x9E3779B97F4A7C15 | 1)
_INV_P = np.uint64(pow(int(_P) | 1, -1, 1 << 64))


def _rolling_hashes(texts: list, k: int):
    """Rabin-Karp hashes of every k-char window of every text, vectorized
    across the whole batch: one cumprod/cumsum over the concatenated code
    points (utf-32 views, so positions are CHARACTER offsets — the same
    unit as Python slicing and SQL ``substr``).

    Window hash = sum(cp[p+t] * P**t for t in range(k)) mod 2**64,
    position-independent: the prefix form sum(cp[j] * P**j) is normalized
    by P**-p, which exists because P is odd.  Returns
    ``(doc_idx, pos, h)`` int64/int64/uint64 arrays.
    """
    cps = [np.frombuffer((t or "").encode("utf-32-le"), dtype=np.uint32)
           for t in texts]
    lens = np.array([len(c) for c in cps], dtype=np.int64)
    counts = np.maximum(lens - k + 1, 0)
    total = int(counts.sum())
    if total == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.uint64))
    v = np.concatenate(cps).astype(np.uint64)
    n = len(v)
    pw = np.full(n, _P, np.uint64)
    pw[0] = np.uint64(1)
    np.cumprod(pw, out=pw)                       # pw[j] = P**j  (mod 2^64)
    ipw = np.full(n, _INV_P, np.uint64)
    ipw[0] = np.uint64(1)
    np.cumprod(ipw, out=ipw)                     # ipw[j] = P**-j (mod 2^64)
    c = np.zeros(n + 1, np.uint64)
    np.cumsum(v * pw, out=c[1:])                 # prefix of cp[j] * P**j
    offs = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    g = np.concatenate([offs[d] + np.arange(counts[d], dtype=np.int64)
                        for d in np.flatnonzero(counts)])
    h = (c[g + k] - c[g]) * ipw[g]
    return doc_idx, g - offs[doc_idx], h


def dup_spans(ds, k: int = 30, id_col: str = "doc_id",
              text_col: str = "text", n_buckets: int | None = None,
              sample_mod: int = 1):
    """Maximal duplicated char spans per document (module docstring).

    Returns a Dataset of ``(id_col, span_start, span_end)``, ``span_end``
    exclusive, one row per maximal span.  ``sample_mod > 1`` switches to
    winnowed (approximate) candidate generation.
    """
    from pawpaw_ray.tuning import shuffle_buckets

    n_buckets = n_buckets or shuffle_buckets()

    def positions_batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        di, pos, h = _rolling_hashes(b[text_col].to_pylist(), k)
        if sample_mod > 1:
            keep = h % np.uint64(sample_mod) == 0
            di, pos, h = di[keep], pos[keep], h[keep]
        hi = h.view(np.int64)  # int64 bit-view: Ray mishandles uint64 keys
        return pa.table({
            "h": pa.array(hi, pa.int64()),
            "hbucket": pa.array((h % np.uint64(n_buckets)).astype(np.int32),
                                pa.int32()),
            id_col: pa.array(ids[di], pa.int64()),
            "pos": pa.array(pos, pa.int64()),
        })

    def hash_candidates(g: pd.DataFrame) -> pd.DataFrame:
        cand = g[g["h"].duplicated(keep=False)]
        ids = cand[id_col].to_numpy(np.int64)
        return pd.DataFrame({
            id_col: ids,
            "pos": cand["pos"].to_numpy(np.int64),
            "text": "",
            "dbucket": hash_bucket(ids, n_buckets),
        })

    def docs_side(b: pa.Table) -> pd.DataFrame:
        # pyarrow in, pandas out: the union peer (hash_candidates) emits
        # pandas blocks, and heterogeneous-union sides must share the
        # block type (see stages/graph.py colocated path)
        ids = b[id_col].to_numpy()
        return pd.DataFrame({
            id_col: ids.astype(np.int64),
            "pos": np.full(len(ids), -1, np.int64),  # kind marker
            "text": b[text_col].to_pandas().fillna("").astype(str),
            "dbucket": hash_bucket(ids, n_buckets),
        })

    def attach_grams(g: pd.DataFrame) -> pd.DataFrame:
        cand = g[g["pos"] >= 0]
        txt = dict(zip(g.loc[g["pos"] < 0, id_col],
                       g.loc[g["pos"] < 0, "text"]))
        grams = [txt[d][p:p + k]
                 for d, p in zip(cand[id_col], cand["pos"])]
        return pd.DataFrame({
            "gram": pd.array(grams, dtype=object),
            id_col: cand[id_col].to_numpy(np.int64),
            "pos": cand["pos"].to_numpy(np.int64),
            "gbucket": hash_bucket(np.asarray(grams, dtype=object), n_buckets)
                       if grams else np.empty(0, np.int32),
        })

    def verify_grams(g: pd.DataFrame) -> pd.DataFrame:
        ok = g[g["gram"].duplicated(keep=False)]
        ids = ok[id_col].to_numpy(np.int64)
        return pd.DataFrame({
            id_col: ids,
            "pos": ok["pos"].to_numpy(np.int64),
            "dbucket": hash_bucket(ids, n_buckets),
        })

    def merge_spans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "pos"], kind="mergesort")
        ids = g[id_col].to_numpy(np.int64)
        pos = g["pos"].to_numpy(np.int64)
        # new island at a doc change or a gap (> k means the intervals
        # [prev, prev+k) and [pos, pos+k) neither overlap nor touch)
        brk = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            brk[1:] = (ids[1:] != ids[:-1]) | (pos[1:] - pos[:-1] > k)
        grp = np.cumsum(brk) - 1
        starts = pos[brk]
        ends = np.zeros(grp[-1] + 1 if len(g) else 0, np.int64)
        np.maximum.at(ends, grp, pos + k)
        return pd.DataFrame({id_col: ids[brk],
                             "span_start": starts,
                             "span_end": ends})

    cand = (ds.map_batches(positions_batch, batch_format="pyarrow")
              .groupby("hbucket")
              .map_groups(hash_candidates, batch_format="pandas"))
    docs = ds.map_batches(docs_side, batch_format="pyarrow")
    return (cand.union(docs)
                .groupby("dbucket")
                .map_groups(attach_grams, batch_format="pandas")
                .groupby("gbucket")
                .map_groups(verify_grams, batch_format="pandas")
                .groupby("dbucket")
                .map_groups(merge_spans, batch_format="pandas"))
