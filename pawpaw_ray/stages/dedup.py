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
                    id_col: str = "doc_id") -> pa.Table:
    """sha1(text) + id ONLY — the text column is dropped before the shuffle
    so the groupby moves ~1% of the corpus bytes, not the corpus."""
    keys = [hashlib.sha1((t or "").encode()).hexdigest()
            for t in batch[text_col].to_pylist()]
    return pa.table({"text_sha1": pa.array(keys, pa.string()),
                     id_col: batch[id_col]})


def exact_dedup(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """First (min id) per identical text + copy count.

    Shuffle discipline: the keyed batch carries only (text_sha1, id) and the
    wide step is a plain ``groupby(text_sha1).aggregate`` — Ray's sort-based
    aggregate handles the high-cardinality key without per-group tasks, and
    no document text ever crosses the exchange."""
    from ray.data.aggregate import Count, Min

    keyed = docs_ds.map_batches(
        lambda b: exact_key_batch(b, text_col, id_col), batch_format="pyarrow")
    return (keyed.groupby("text_sha1")
            .aggregate(Min(id_col, alias_name=id_col),
                       Count(alias_name="n_copies")))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def _minhash_params(num_perm: int, seed: int = 7):
    """Per-permutation 64-bit xor-seeds for the splitmix64 finalizer.

    Round 1 used (a*x + b) mod (2^61 - 1) computed in uint64, which wrapped
    mod 2^64 before the Mersenne reduction (not the intended family); the
    obvious fix — coefficients small enough not to wrap — leaves the map
    piecewise-monotone in x (at most 4 wraps for 32-bit shingle hashes), so
    the per-permutation match rate measured ~0.12 at true Jaccard 0.29.  A
    strong 64-bit bit-mixer applied to x ^ seed_i has no such structure and
    its match rate tracks Jaccard to sampling noise (tests/test_cc.py).
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    return (rng.integers(0, 1 << 64, size=num_perm, dtype=np.uint64),)


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — wrapping uint64 arithmetic is the mixing."""
    z = (z + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


# per-gram-position odd multipliers for the k-gram shingle combine (rule
# constant of the shingle-hash family, shared by batch and single-doc paths)
_GRAM_MULT_CACHE: dict[int, np.ndarray] = {}


def _gram_mults(k: int) -> np.ndarray:
    m = _GRAM_MULT_CACHE.get(k)
    if m is None:
        m = (_splitmix64(np.arange(1, k + 1, dtype=np.uint64)
                         * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1))
        _GRAM_MULT_CACHE[k] = m
    return m


def _flat_tokens_arrow(texts) -> tuple[np.ndarray, np.ndarray, int]:
    """Vectorized batch tokenizer: ``(flat lowered token object array,
    int64 doc index per token, D)`` in document order.

    Token SET semantics identical to :func:`_norm_tokens` — maximal
    ``[A-Za-z0-9_]+`` runs, split FIRST then lowered (so no unicode char
    can case-fold INTO the ASCII token class, e.g. U+212A → 'k')."""
    import pyarrow.compute as pc
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array([t if t is not None else "" for t in texts],
                         pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    D = len(texts)
    texts = pc.fill_null(texts, "")
    la = pc.split_pattern_regex(texts, pattern="[^A-Za-z0-9_]+")
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    # slice-aware child access: flatten() rebases values; rebase offsets too
    offs = np.asarray(la.offsets, dtype=np.int64)
    offs = offs - offs[0]
    toks = pc.utf8_lower(la.flatten())
    lens = pc.utf8_length(toks).to_numpy(zero_copy_only=False)
    keep = lens > 0  # split() emits "" at text edges / for empty docs
    doc_idx = np.repeat(np.arange(D, dtype=np.int64), np.diff(offs))[keep]
    return toks.to_numpy(zero_copy_only=False)[keep], doc_idx, D


def _token_hash_flat(texts) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized tokenizer+hasher for a whole batch of texts.

    Returns ``(flat uint64 token hashes, int64 per-doc offsets, len D+1)``.
    Token hash = siphash via ``pd.util.hash_array`` (fixed key:
    deterministic across processes; ``categorize=True`` hashes each
    unique token once)."""
    flat, doc_idx, D = _flat_tokens_arrow(texts)
    new_offs = np.zeros(D + 1, dtype=np.int64)
    np.cumsum(np.bincount(doc_idx, minlength=D), out=new_offs[1:])
    if len(flat) == 0:
        return np.empty(0, np.uint64), new_offs
    th = pd.util.hash_array(flat).astype(np.uint64)
    return th, new_offs


def _shingle_hash_flat(th: np.ndarray, offs: np.ndarray, k: int
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Flat token hashes → flat word-k-gram shingle hashes, doc-ordered.

    Per doc: ``c >= k`` tokens → ``c-k+1`` shingles (positional-multiplier
    combine + splitmix64 finalize); ``0 < c < k`` → ONE shingle over all c
    tokens (the "join everything" gram of the original rule); ``c == 0`` →
    none.  Returns ``(sh uint64, sh_offs int64 len D+1)``.
    """
    D = len(offs) - 1
    counts = np.diff(offs)
    sh_counts = np.where(counts >= k, counts - (k - 1),
                         np.where(counts > 0, 1, 0)).astype(np.int64)
    sh_offs = np.zeros(D + 1, dtype=np.int64)
    np.cumsum(sh_counts, out=sh_offs[1:])
    sh = np.zeros(int(sh_offs[-1]), dtype=np.uint64)
    if sh.size == 0:
        return sh, sh_offs
    mults = _gram_mults(k)
    T = len(th)
    doc_idx = np.repeat(np.arange(D, dtype=np.int64), counts)
    slot_doc = np.repeat(np.arange(D, dtype=np.int64), sh_counts)
    full_slot = counts[slot_doc] >= k
    if T >= k:
        # start positions whose k-th token is still in the same doc; the
        # surviving shingles are emitted in ascending doc order, exactly
        # matching the full-doc slots of ``sh``
        ok = doc_idx[:T - k + 1] == doc_idx[k - 1:]
        acc = np.zeros(T - k + 1, dtype=np.uint64)
        for j in range(k):
            acc += th[j:T - k + 1 + j] * mults[j]
        sh[full_slot] = _splitmix64(acc[ok])
    short = np.flatnonzero((counts > 0) & (counts < k))
    if len(short):
        short_sh = np.zeros(len(short), dtype=np.uint64)
        for c in range(1, k):
            sel = counts[short] == c
            if not sel.any():
                continue
            starts = offs[short[sel]]
            acc = np.zeros(int(sel.sum()), dtype=np.uint64)
            for j in range(c):
                acc += th[starts + j] * mults[j]
            short_sh[sel] = _splitmix64(acc)
        sh[~full_slot] = short_sh
    return sh, sh_offs


def shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (uint64) — single-doc view of the batch
    kernel (:func:`_shingle_hash_flat`), same rule constants."""
    th, offs = _token_hash_flat([text])
    sh, _ = _shingle_hash_flat(th, offs, k)
    return sh


def minhash_signatures(texts, seeds: np.ndarray, k: int = 3) -> np.ndarray:
    """(D, num_perm) uint64 signatures for a whole batch, vectorized:
    one tokenizer/hasher pass, one shingle pass, then per-permutation
    ``splitmix64(unique_shingles ^ seed)`` scattered back through the
    inverse index + per-doc 1D ``np.minimum.reduceat``.  Hashing unique
    shingles only (corpora share vocabulary — the `simhash64_many`
    treatment) plus the 1D layout measured ~10x faster than a
    (shingles, perms) 2D matrix on sf0.1 documents.  Docs with no
    shingles get the all-zeros signature."""
    th, offs = _token_hash_flat(texts)
    sh, sh_offs = _shingle_hash_flat(th, offs, k)
    D, P = len(sh_offs) - 1, len(seeds)
    sig = np.zeros((D, P), dtype=np.uint64)
    ne = np.flatnonzero(np.diff(sh_offs) > 0)
    if not len(ne):
        return sig
    # empty docs span zero rows, so nonempty starts are exact segment
    # boundaries for reduceat
    starts = sh_offs[ne]
    u, inv = np.unique(sh, return_inverse=True)
    vbuf = np.empty(len(sh), dtype=np.uint64)
    for p in range(P):
        np.take(_splitmix64(u ^ seeds[p]), inv, out=vbuf)
        sig[ne, p] = np.minimum.reduceat(vbuf, starts)
    return sig


def minhash_signature(text: str, seeds: np.ndarray, k: int = 3) -> np.ndarray:
    return minhash_signatures([text], seeds, k)[0]


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(D, num_perm) signatures → (D, bands) int64 LSH bucket keys: a
    splitmix64 xor-chain over each band's signature rows, band index mixed
    into the chain seed (equal band chunks ⇔ equal keys up to 64-bit
    collision odds — replaces one sha1 per (doc, band))."""
    D, P = sig.shape
    rpb = P // bands
    out = np.empty((D, bands), dtype=np.uint64)
    for band in range(bands):
        acc = _splitmix64(np.full(
            D, np.uint64(0xA0761D6478BD642F) ^ np.uint64(band),
            dtype=np.uint64))
        for r in range(rpb):
            acc = _splitmix64(acc ^ sig[:, band * rpb + r])
        out[:, band] = acc
    return out.view(np.int64)


class MinHashLSH:
    """Signature stage: permutation params built once per actor/process.

    Emits one row per (doc, band): ``(band, band_hash, doc_id)`` — the LSH
    bucket key the groupby shuffles on (``band_hash`` is an int64 mixed
    key, see :func:`band_keys`).  Fully vectorized per batch:
    :func:`minhash_signatures` + :func:`band_keys`.
    """

    def __init__(self, num_perm: int = 64, bands: int = 8, k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        assert num_perm % bands == 0
        (self.seeds,) = _minhash_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        D = len(batch)
        ids = (batch[self.id_col].combine_chunks()
               .to_numpy(zero_copy_only=False).astype(np.int64))
        # utf8 byte length per doc rides the signature table so downstream
        # byte-aware gates never re-scan the text column (see near_dup_jaccard)
        nb = (pc.fill_null(pc.binary_length(
                  batch[self.text_col].cast(pa.binary())), 0)
              .to_numpy(zero_copy_only=False).astype(np.int64))
        sig = minhash_signatures(batch[self.text_col], self.seeds, self.k)
        keys = band_keys(sig, self.bands)  # (D, bands) int64, doc-major
        B = self.bands
        return pa.table({
            "band": pa.array(np.tile(np.arange(B, dtype=np.int32), D),
                             pa.int32()),
            "band_hash": pa.array(keys.ravel(), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, B), pa.int64()),
            "n_text_bytes": pa.array(np.repeat(nb, B), pa.int64()),
        })


# Observability for capped-recall events: a bucket larger than
# ``max_all_pairs`` falls back to multi-hub stars, which (on the paths with
# no later per-pair verification, e.g. simhash) can DROP a genuine pair
# whose two members are near each other but far from every hub.  Counters
# are per worker process; the first event per (process, kind) logs a
# warning so capped recall is visible in the Ray worker logs, and tests
# can read the counter after driving the pairing kernel in-process.
CAPPED_BUCKET_EVENTS: dict[str, int] = {}


def note_capped_bucket(kind: str, n: int, max_all_pairs: int) -> None:
    from pawpaw_ray.state.counters import note_event
    note_event(f"capped_bucket:{kind}")
    seen = CAPPED_BUCKET_EVENTS.get(kind, 0)
    CAPPED_BUCKET_EVENTS[kind] = seen + 1
    if seen == 0:
        import logging
        logging.getLogger(__name__).warning(
            "%s: bucket of %d docs exceeds max_all_pairs=%d; falling back "
            "to multi-hub stars (pairs between two non-hub members may be "
            "dropped — bounded-recall event, counted per worker process)",
            kind, n, max_all_pairs)


def _pairs_from_bucket(g: pd.DataFrame, all_pairs: bool = False,
                       max_all_pairs: int = 512) -> pd.DataFrame:
    """Candidate pairs from one LSH bucket.

    Default emits star pairs (min-id × rest) — sufficient for min-label
    clustering of the *unverified* bucket graph.  ``all_pairs=True`` emits
    every in-bucket pair: required when pairs are then individually
    VERIFIED (a failed star edge must not disconnect a genuine pair among
    the remaining members).  Buckets larger than ``max_all_pairs`` fall
    back to MULTI-hub stars, hubs SPREAD evenly across the sorted id range
    (h sized so the emitted pairs never exceed the all-pairs cost at the
    threshold): a genuine pair disconnects only if ALL h hubs fail
    verification against both sides, and because hubs sample the whole
    range — not the h smallest ids — a cluster of adversarially-small
    outlier ids cannot occupy every hub (round-2 advice).  The quadratic
    blowup is the greater evil at scale, and giant LSH buckets are
    near-identical text in practice, so any hub connects the survivors.
    """
    ids = np.sort(g["doc_id"].unique())
    n = len(ids)
    if n < 2:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64)})
    if all_pairs and n <= max_all_pairs:
        iu, ju = np.triu_indices(n, k=1)
        return pd.DataFrame({"a": ids[iu], "b": ids[ju]})
    if not all_pairs:
        # unverified path: a single min-id star suffices for min-label CC
        return pd.DataFrame({"a": np.repeat(ids[0], n - 1), "b": ids[1:]})
    note_capped_bucket("minhash_verify", n, max_all_pairs)
    n_hubs = max(1, min(n - 1, max_all_pairs * max_all_pairs // (2 * n)))
    hub_idx = np.unique(np.linspace(0, n - 1, n_hubs).astype(np.int64))
    a_parts, b_parts = [], []
    for hi in hub_idx:
        others = np.delete(ids, hi)
        a_parts.append(np.minimum(ids[hi], others))
        b_parts.append(np.maximum(ids[hi], others))
    return (pd.DataFrame({"a": np.concatenate(a_parts),
                          "b": np.concatenate(b_parts)})
            .drop_duplicates(ignore_index=True))


def _dedup_pairs(pairs_ds):
    """Distinct (a, b) rows without a driver pull: bands emit the same pair
    up to ``bands`` times; one small aggregate collapses them before the
    (far costlier) verification / clustering stages."""
    from ray.data.aggregate import Count

    deduped = pairs_ds.groupby(["a", "b"]).aggregate(Count(alias_name="_n"))
    return deduped.drop_columns(["_n"])


# signature params are microseconds to build — a per-process cache makes the
# stage a plain task pool (no actor spin-up), same once-per-worker state story
_LSH_CACHE: dict[tuple, MinHashLSH] = {}


def _lsh_signature_fn(num_perm: int, bands: int, k: int, id_col: str,
                      text_col: str):
    key = (num_perm, bands, k, id_col, text_col)

    def signature_batch(batch: pa.Table) -> pa.Table:
        inst = _LSH_CACHE.get(key)
        if inst is None:
            inst = _LSH_CACHE[key] = MinHashLSH(*key)
        return inst(batch)

    return signature_batch


def _bucketize_band_hash(b: pa.Table, n_buckets: int) -> pa.Table:
    """Route (band, band_hash) groups through a cluster-sized bucket column:
    one shuffle partition per bucket instead of one tiny sort-group per LSH
    bucket (thousands of groups of ~1-3 rows otherwise dominate wall time)."""
    h = (b["band_hash"].combine_chunks().to_numpy(zero_copy_only=False)
         .view(np.uint64) % np.uint64(n_buckets)).astype(np.int32)
    return b.append_column("bucket", pa.array(h, pa.int32()))


def _pairs_from_bucket_group(g: pd.DataFrame, all_pairs: bool) -> pd.DataFrame:
    # almost all band hashes are singletons; dropping them BEFORE the
    # per-group loop removes ~95% of the per-group pandas overhead (the
    # loop cost, not the shuffle, dominated this stage)
    g = g[g.duplicated("band_hash", keep=False)]
    frames = [_pairs_from_bucket(sub, all_pairs)
              for _, sub in g.groupby("band_hash", sort=False)]
    if not frames:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64)})
    return pd.concat(frames, ignore_index=True)


# Below this many (doc, band) rows the pair generation collapses to ONE
# task (pandas groupby over the whole band table, dedup in the same task):
# the distributed sort-groupby costs seconds of fixed shuffle overhead that
# dwarfs small inputs.  Same size-adaptive principle as stages/cc.py —
# 100 TB inputs blow past this and take the bucketed-shuffle path; the
# gate only routes work that trivially fits one worker (~40 B/row → ≤80 MB).
SMALL_BAND_ROWS = 2_000_000


def _pairs_single_task(g: pd.DataFrame, all_pairs: bool,
                       distinct: bool) -> pd.DataFrame:
    out = _pairs_from_bucket_group(g, all_pairs)
    return out.drop_duplicates() if distinct else out


def _lsh_pairs(docs_ds, num_perm: int, bands: int, k: int, id_col: str,
               text_col: str, all_pairs: bool = False,
               distinct: bool = True,
               small_band_rows: int | None = None,
               return_doc_bytes: bool = False):
    """documents → LSH candidate-pair Dataset (a, b).

    ``distinct=False`` skips the pair-dedup shuffle — correct whenever the
    consumer tolerates duplicate edges (connected components does; pairwise
    verification does not).

    The size gate counts the materialized band table (signatures only,
    ~40 B/row) rather than ``docs_ds`` — a computed, non-read-backed input
    therefore executes its lineage exactly ONCE, and the groupby below
    buffers its input anyway (AllToAll), so the pin costs nothing extra.

    ``return_doc_bytes=True`` additionally returns a (doc_id, n_text_bytes)
    Dataset carved from the materialized band table (band-0 rows) — the
    byte-aware verification gate reads THIS instead of re-scanning the
    text column of ``docs_ds``."""
    import pyarrow.compute as pc

    from pawpaw_ray.tuning import shuffle_buckets

    if small_band_rows is None:
        small_band_rows = SMALL_BAND_ROWS  # read at call time (patchable)
    bands_ds = docs_ds.map_batches(
        _lsh_signature_fn(num_perm, bands, k, id_col, text_col),
        batch_format="pyarrow").materialize()
    doc_bytes_ds = None
    if return_doc_bytes:
        doc_bytes_ds = bands_ds.map_batches(
            lambda b: b.filter(pc.equal(b["band"], 0))
                       .select(["doc_id", "n_text_bytes"]),
            batch_format="pyarrow")
    n_rows = bands_ds.count()
    if n_rows <= small_band_rows:
        pairs = (bands_ds.repartition(1)
                 .map_batches(lambda g: _pairs_single_task(g, all_pairs,
                                                           distinct),
                              batch_format="pandas", batch_size=None))
        return (pairs, doc_bytes_ds) if return_doc_bytes else pairs
    n_buckets = shuffle_buckets()
    pairs = (bands_ds
             .map_batches(lambda b: _bucketize_band_hash(b, n_buckets),
                          batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(lambda g: _pairs_from_bucket_group(g, all_pairs),
                         batch_format="pandas"))
    pairs = _dedup_pairs(pairs) if distinct else pairs
    return (pairs, doc_bytes_ds) if return_doc_bytes else pairs


def minhash_clusters(docs_ds, num_perm: int = 64, bands: int = 8, k: int = 3,
                     id_col: str = "doc_id", text_col: str = "text",
                     ) -> pd.DataFrame:
    """MinHash-LSH near-dup clustering.

    Returns a pandas DataFrame ``(doc_id, cluster_id)`` where cluster_id is
    the min doc_id of the connected component.  The signature scan is the
    heavy distributed stage; the component labelling runs distributed too
    (star-contraction rounds over the pair list, :mod:`pawpaw_ray.stages.cc`)
    — no pair list or id list is ever materialized on the driver.
    """
    from pawpaw_ray.stages.cc import cc_labels_pandas

    pairs = _lsh_pairs(docs_ds, num_perm, bands, k, id_col, text_col,
                       distinct=False)  # CC dedups edges itself
    return cc_labels_pandas(pairs, docs_ds.select_columns([id_col]), id_col)


def dedup_keep_best(docs_ds, num_perm: int = 64, bands: int = 8, k: int = 3,
                    id_col: str = "doc_id", text_col: str = "text",
                    score_col: str = "n_chars", score_bits: int = 23):
    """Near-dup clustering with representative selection: one output row
    per cluster ``(cluster_id, keep_id, n_members)`` where ``keep_id`` is
    the member with the highest ``score_col`` (tie → min id) — the
    keep-the-best-copy step of a production dedup pass (min-id keeps
    whatever URL happened to be crawled first; keeping the longest /
    highest-quality copy is what training pipelines actually do).

    Distributed shape: LSH pairs → CC labels (both shared with
    :func:`minhash_clusters`) → ONE hash join labels⋈scores → per-batch
    partial arg-max via an order-preserving packed int64
    ``score * 2^id_bits + (2^id_bits - 1 - id)`` → bucketed groupby
    reduce (vectorized in-group max/sum).  The argmax therefore moves one
    int64 per (batch, cluster) through the shuffle, never raw members.

    Packing bounds (asserted): ``0 <= id < 2^(63 - score_bits)`` (default
    2^40 ≈ 1.1e12 ids) and scores clamp to ``2^score_bits - 1`` (default
    8.4M chars) — two docs both above the clamp tie down to min id.
    """
    import ray.data as rd

    from pawpaw_ray.stages.cc import cc_labels
    from pawpaw_ray.tuning import join_partitions, shuffle_buckets

    id_bits = 63 - score_bits
    id_cap, score_cap = 1 << id_bits, (1 << score_bits) - 1

    pairs = _lsh_pairs(docs_ds.select_columns([id_col, text_col]),
                       num_perm, bands, k, id_col, text_col, distinct=False)
    labels = cc_labels(pairs, docs_ds.select_columns([id_col]), id_col)
    meta = docs_ds.select_columns([id_col, score_col])

    # same empty-partition defenses as _verify_pairs_join (Ray 2.49 hash
    # join; see the comment there): far-negative sentinel ids on both
    # sides cover every partition, dropped in the packing step below
    n_parts = join_partitions()
    n_sent = 32 * n_parts
    sent_ids = -(np.arange(1, n_sent + 1, dtype=np.int64) + (1 << 62))
    labels = labels.union(rd.from_arrow(pa.table(
        {id_col: pa.array(sent_ids, pa.int64()),
         "cluster_id": pa.array(sent_ids, pa.int64())})))
    meta = meta.union(rd.from_arrow(pa.table(
        {id_col: pa.array(sent_ids, pa.int64()),
         score_col: pa.array(np.zeros(n_sent, dtype=np.int64), pa.int64())})))
    n_buckets = shuffle_buckets()
    sch = pa.schema([("cluster_id", pa.int64()), ("packed", pa.int64()),
                     ("n", pa.int64()), ("kbucket", pa.int32())])

    def pack_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[id_col] >= 0]  # sentinels out
        if not len(df):
            return pd.DataFrame({"cluster_id": np.array([], np.int64),
                                 "packed": np.array([], np.int64),
                                 "n": np.array([], np.int64)})
        ids = df[id_col].to_numpy(np.int64)
        if int(ids.max()) >= id_cap:
            raise ValueError(
                f"{id_col} >= 2^{id_bits} breaks the packed argmax; "
                f"lower score_bits")
        sc_raw = df[score_col].fillna(0).to_numpy(np.int64)
        n_clamped = int((sc_raw > score_cap).sum())
        if n_clamped:
            # clamped scores tie down to min id, diverging from the
            # documented max-score semantics — count it where the driver
            # can see it (round-4 advice; raising would be worse than the
            # documented tie-break at corpus scale)
            from pawpaw_ray.state.counters import note_event
            note_event("keep_best_score_clamp", n_clamped)
            import logging
            logging.getLogger(__name__).warning(
                "dedup_keep_best: %d score(s) above 2^%d-1 clamped "
                "(ties fall to min id); raise score_bits if scores "
                "legitimately exceed the cap", n_clamped, score_bits)
        sc = np.clip(sc_raw, 0, score_cap)
        packed = sc * id_cap + (id_cap - 1 - ids)
        g = (pd.DataFrame({"cluster_id": df["cluster_id"].to_numpy(np.int64),
                           "packed": packed})
             .groupby("cluster_id", sort=False)["packed"]
             .agg(packed="max", n="size").reset_index())
        return g.astype("int64")

    joined = labels.join(meta, join_type="inner",
                         num_partitions=n_parts,
                         on=(id_col,), right_on=(id_col,))
    def partial_batch(b: pa.Table) -> pa.Table:
        if b.num_columns == 0:  # schema-less empty-partition block
            return sch.empty_table()
        g = pack_partial(b.to_pandas())
        g["kbucket"] = (g["cluster_id"].to_numpy(np.int64)
                        % n_buckets).astype(np.int32)
        return pa.Table.from_pandas(g, schema=sch, preserve_index=False)

    # bucketed final reduce (vectorized in-group max/sum) — Ray's native
    # groupby().aggregate accumulates per row in Python, measured ~30x
    # slower on row-scale partial tables
    def bucket_reduce(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("cluster_id", sort=False)
        out = pd.DataFrame({"packed": grp["packed"].max(),
                            "n": grp["n"].sum()}).reset_index()
        return out.astype("int64")

    agg = (joined.map_batches(partial_batch, batch_format="pyarrow")
                 .groupby("kbucket")
                 .map_groups(bucket_reduce, batch_format="pandas"))

    def decode(b: pa.Table) -> pa.Table:
        packed = b["packed"].to_numpy().astype(np.int64)
        return pa.table({
            "cluster_id": b["cluster_id"].cast(pa.int64()),
            "keep_id": pa.array(id_cap - 1 - (packed % id_cap), pa.int64()),
            "n_members": b["n"].cast(pa.int64()),
        })

    return agg.map_batches(decode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over token blake2b hashes, weighted by occurrence
    count.  One blake2b per UNIQUE token, then a single vectorized
    bit-unpack + weighted column sum (the round-1 per-token Python loop was
    the slowest kernel in the repo per byte; output is bit-identical)."""
    toks = _norm_tokens(text)
    if not toks:
        return 0
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    hs = np.fromiter(
        (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(),
                        "big") for t in counts),
        dtype=np.uint64, count=len(counts))
    w = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little").astype(np.int64)  # (n, 64)
    acc = ((2 * bits - 1) * w[:, None]).sum(axis=0)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return int(((acc > 0).astype(np.uint64) * weights).sum())


def simhash64_many(texts: list[str]) -> np.ndarray:
    """Batch simhash: Arrow-vectorized tokenization (r5 — the per-doc
    regex loop was 6.7x the kernel's total cost on sf0.1), ONE blake2b
    per unique token across the whole batch (corpora share vocabulary),
    one ``np.add.at`` scatter for all (doc, token) occurrences.  Output is
    bit-identical to :func:`simhash64` per doc (pinned by test)."""
    flat, doc_idx, D = _flat_tokens_arrow(texts)
    out = np.zeros(D, dtype=np.uint64)
    if not len(flat):
        return out
    codes, uniq = pd.factorize(flat)
    hs = np.fromiter(
        (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(),
                        "big") for t in uniq),
        dtype=np.uint64, count=len(uniq))
    signed = (2 * np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1,
                                bitorder="little").astype(np.int64) - 1)
    acc = np.zeros((D, 64), dtype=np.int64)
    np.add.at(acc, doc_idx, signed[codes])
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    nonempty = np.zeros(D, dtype=bool)
    nonempty[doc_idx] = True
    vals = ((acc > 0).astype(np.uint64) * weights[None, :]).sum(axis=1)
    out[nonempty] = vals[nonempty]
    return out


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = simhash64_many(batch[text_col].to_pylist())
    return batch.append_column("simhash64", pa.array(vals, pa.uint64()))


# ---------------------------------------------------------------------------
# n-gram Jaccard (verification kernel for near-dup candidates)
# ---------------------------------------------------------------------------

def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(shingles(text_a, k).tolist()), set(shingles(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def jaccard_many(texts_a: list, texts_b: list, k: int = 3) -> np.ndarray:
    """Pairwise Jaccard for a batch of text pairs: shingle sets computed
    ONCE per unique text across both sides (one vectorized batch-kernel
    pass), then per-pair sorted-array intersections.  Same per-pair value
    as :func:`jaccard` (both reduce to shingle-hash set Jaccard)."""
    n = len(texts_a)
    all_t = pd.Series(list(texts_a) + list(texts_b), dtype=object).fillna("")
    codes, uniq = pd.factorize(all_t)
    th, offs = _token_hash_flat(uniq.tolist())
    sh, sh_offs = _shingle_hash_flat(th, offs, k)
    sets = [np.unique(sh[sh_offs[i]:sh_offs[i + 1]])
            for i in range(len(uniq))]
    out = np.empty(n, np.float64)
    for i in range(n):
        sa, sb = sets[codes[i]], sets[codes[n + i]]
        if not len(sa) and not len(sb):
            out[i] = 1.0
            continue
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        out[i] = inter / max(1, len(sa) + len(sb) - inter)
    return out


# Above this many candidate docs — OR this many total candidate text
# bytes — verification stops broadcasting a text dict (driver memory!)
# and joins texts onto the pair list with the native hash join instead —
# the 100 TB path.  The byte leg matters independently: 100k MB-scale
# documents are a multi-GB pull even though the count looks safe.
BROADCAST_CAND_DOCS = 100_000
BROADCAST_CAND_BYTES = 64 * 2**20


def _verify_pairs_broadcast(pairs_ds, docs_ds, cand_ids, threshold, k,
                            id_col, text_col):
    """Small candidate set: filtered pull → broadcast dict → one map."""
    import pyarrow.compute as pc
    import ray

    cand = (docs_ds.map_batches(
                lambda b: b.filter(pc.is_in(b[id_col], value_set=cand_ids)),
                batch_format="pyarrow")
            .to_pandas())
    texts_ref = ray.put(dict(zip(cand[id_col], cand[text_col])))

    def verify(b: pa.Table) -> pa.Table:
        from pawpaw_ray.state.broadcast import cached_get
        lut = cached_get(texts_ref)
        aa = b["a"].to_pylist()
        bb = b["b"].to_pylist()
        sims = jaccard_many([lut.get(x, "") for x in aa],
                            [lut.get(y, "") for y in bb], k)
        keep = pa.array(sims >= threshold)
        return b.append_column("jaccard",
                               pa.array(sims, pa.float64())).filter(keep)

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


def _verify_pairs_join(pairs_ds, docs_ds, threshold, k, id_col, text_col):
    """Large candidate set: two hash joins ship each side's text to its
    pair rows (nothing on the driver), then the same per-pair kernel."""
    from pawpaw_ray.tuning import join_partitions

    # materialize between the joins so only ONE join's aggregator-actor
    # pool is alive at a time (two live pools can deadlock a small
    # cluster; at scale the barrier spills to the object store, which is
    # what a hash join's build side does anyway)
    n_parts = join_partitions()
    texts = docs_ds.select_columns([id_col, text_col])
    base = texts.schema().base_schema
    t_type = (base.field(text_col).type if isinstance(base, pa.Schema)
              else pa.string())  # pandas-backed blocks convert to string

    ta, tb = f"{text_col}_a", f"{text_col}_b"
    sch_a = pa.schema([("a", pa.int64()), ("b", pa.int64()), (ta, t_type)])
    sch_ab = sch_a.append(pa.field(tb, t_type))

    # Ray's hash-shuffle join aggregator crashes when a partition receives
    # ZERO shards on either side (its block builder yields a schema-less
    # table and pa.Table.join can't resolve the key) — a sparse pair list
    # leaves partitions empty.  OBSERVED ON ray[data]==2.49.2
    # (HashShuffleAggregator/JoinOperator empty-partition path; internal
    # behavior, not a documented contract — re-test this workaround on any
    # Ray upgrade; tests/test_cc.py::test_verify_pairs_join_sparse_partitions
    # is the canary).  Two defenses, in order:
    #   1. the rename() helper below maps any schema-less block to
    #      schema.empty_table() — the deterministic primary defense;
    #   2. self-joining sentinel rows in the far-negative id range cover
    #      every partition w.h.p. (32·n_parts rows → per-partition miss
    #      odds ~e^-32): they survive both joins (a == b == sentinel,
    #      matched by sentinel text rows) and the a != b filter after
    #      verification drops them.
    import ray.data as rd
    n_sent = 32 * n_parts
    sent_ids = -(np.arange(1, n_sent + 1, dtype=np.int64) + (1 << 62))
    pairs_ds = pairs_ds.union(rd.from_arrow(pa.table(
        {"a": pa.array(sent_ids, pa.int64()),
         "b": pa.array(sent_ids, pa.int64())})))
    texts = texts.union(rd.from_arrow(pa.table(
        {id_col: pa.array(sent_ids, pa.int64()),
         text_col: pa.array([""] * n_sent, t_type)})))

    def rename(b: pa.Table, col: str, to: str, schema: pa.Schema) -> pa.Table:
        if b.num_columns == 0:  # belt-and-braces vs schema-less blocks
            return schema.empty_table()
        return b.rename_columns([to if c == col else c
                                 for c in b.column_names])

    joined = (pairs_ds.join(texts, join_type="inner",
                            num_partitions=n_parts,
                            on=("a",), right_on=(id_col,))
              .map_batches(lambda b: rename(b, text_col, ta, sch_a),
                           batch_format="pyarrow")
              .materialize())
    joined = (joined.join(texts, join_type="inner",
                          num_partitions=n_parts,
                          on=("b",), right_on=(id_col,))
              .map_batches(lambda b: rename(b, text_col, tb, sch_ab),
                           batch_format="pyarrow"))

    def verify(b: pa.Table) -> pa.Table:
        if b.num_columns == 0:
            b = sch_ab.empty_table()
        aa = b["a"].combine_chunks().to_numpy(zero_copy_only=False)
        bb = b["b"].combine_chunks().to_numpy(zero_copy_only=False)
        sims = jaccard_many(b[ta].to_pylist(), b[tb].to_pylist(), k)
        # a != b also drops the partition-coverage sentinels (real pairs
        # are strict upper-triangle, never self-pairs)
        keep = pa.array((sims >= threshold) & (aa != bb))
        return (b.select(["a", "b"])
                .append_column("jaccard", pa.array(sims, pa.float64()))
                .filter(keep))

    return joined.map_batches(verify, batch_format="pyarrow")


def near_dup_jaccard(docs_ds, threshold: float = 0.8, num_perm: int = 64,
                     bands: int = 8, k: int = 3, id_col: str = "doc_id",
                     text_col: str = "text",
                     broadcast_cand_docs: int = BROADCAST_CAND_DOCS,
                     broadcast_cand_bytes: int = BROADCAST_CAND_BYTES
                     ) -> pd.DataFrame:
    """MinHash-LSH candidates VERIFIED by exact n-gram Jaccard ≥ threshold.

    The LSH pass bounds candidate pairs; because each pair is then verified
    individually, buckets emit ALL in-bucket pairs (a star-only emission
    would silently disconnect b∼c whenever the bucket's min-id doc a fails
    verification against both).  Verification is size-adaptive: few
    candidate docs → filtered pull broadcast once and cached per worker;
    many → the texts are hash-JOINED onto the pair list so nothing ever
    lands on the driver.  Components are labelled distributed
    (:mod:`pawpaw_ray.stages.cc`).  Output: (doc_id, cluster_id) like
    :func:`minhash_clusters`, but without LSH false positives.
    """
    from pawpaw_ray.stages.cc import cc_labels_pandas

    pairs_ds, doc_bytes_ds = _lsh_pairs(docs_ds, num_perm, bands, k, id_col,
                                        text_col, all_pairs=True,
                                        return_doc_bytes=True)
    pairs_ds = pairs_ds.materialize()
    ids_ds = docs_ds.select_columns([id_col])

    if pairs_ds.count() == 0:
        return cc_labels_pandas(pairs_ds, ids_ds, id_col)

    # gate on the DISTINCT candidate-doc count (a small distributed
    # aggregate over int64s — the pair list itself never reaches the
    # driver): duplicate-heavy corpora have pairs >> docs, and broadcasting
    # a few hundred texts beats two join shuffles by a mile
    nodes = pairs_ds.map_batches(
        lambda b: pa.table({"n": pa.concat_arrays(
            [b["a"].combine_chunks().cast(pa.int64()),
             b["b"].combine_chunks().cast(pa.int64())])}),
        batch_format="pyarrow")
    distinct_nodes = nodes.groupby("n").count().materialize()
    n_cand = distinct_nodes.count()

    use_broadcast = n_cand <= broadcast_cand_docs
    cand_ids = None
    if use_broadcast:
        cand_ids = pa.array(np.sort(
            distinct_nodes.to_pandas()["n"].to_numpy(np.int64)))
        # byte-aware leg of the gate (the count alone says nothing about
        # text volume): sum the candidates' utf8 byte lengths from the
        # (doc_id, n_text_bytes) side table the signature pass already
        # produced — no re-scan of the text column, no extra lineage
        # execution for computed inputs; only int64 partials move
        def cand_text_bytes(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            t = b.filter(pc.is_in(b["doc_id"], value_set=cand_ids))
            nb = pc.sum(t["n_text_bytes"]).as_py() or 0
            return pa.table({"nb": pa.array([nb], pa.int64())})

        total_bytes = (doc_bytes_ds.map_batches(cand_text_bytes,
                                                batch_format="pyarrow")
                       .sum("nb") or 0)
        use_broadcast = total_bytes <= broadcast_cand_bytes

    if use_broadcast:
        verified = _verify_pairs_broadcast(pairs_ds, docs_ds, cand_ids,
                                           threshold, k, id_col, text_col)
    else:
        verified = _verify_pairs_join(pairs_ds, docs_ds, threshold, k,
                                      id_col, text_col)
    return cc_labels_pandas(verified.select_columns(["a", "b"]), ids_ds, id_col)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                      axis=1).sum(axis=1).astype(np.uint8)


def _hamming_matrix(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
    """(|sa|, |sb|) pairwise Hamming distances between uint64 signatures:
    one broadcast XOR + byte-table popcount — no Python loop."""
    x = sa[:, None] ^ sb[None, :]
    return (_POP8[x.view(np.uint8).reshape(len(sa), len(sb), 8)]
            .sum(axis=2, dtype=np.int64))


def _simhash_band_pairs(g: pd.DataFrame, max_hamming: int,
                        id_col: str = "doc_id",
                        max_all_pairs: int = 512) -> pd.DataFrame:
    """Hamming-verified pairs within one exact-band collision group —
    vectorized XOR-popcount matrix; groups beyond ``max_all_pairs``
    fall back to multi-hub stars (same pair budget and rationale as
    ``_pairs_from_bucket``: a duplicate-heavy corpus can land millions
    of identical signatures in ONE band bucket, and n²/2 Python
    hamming calls there would be unbounded).  Capped groups are counted
    via :func:`note_capped_bucket` (kind ``"simhash"``)."""
    empty = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                          "b": pd.Series([], dtype=np.int64)})
    if len(g) < 2:
        return empty
    g = g.drop_duplicates(id_col).sort_values(id_col)
    ids = g[id_col].to_numpy(np.int64)
    sigs = g["simhash64"].to_numpy(np.uint64)
    n = len(ids)
    if n < 2:
        return empty
    if n <= max_all_pairs:
        d = _hamming_matrix(sigs, sigs)
        iu, ju = np.triu_indices(n, k=1)
        keep = d[iu, ju] <= max_hamming
        return pd.DataFrame({"a": ids[iu[keep]], "b": ids[ju[keep]]})
    # multi-hub stars, hubs SPREAD across the sorted id range (same
    # rationale as _pairs_from_bucket: the h smallest ids could all be
    # outliers and mask genuine pairs); identical/near-identical
    # signatures (the only way a band bucket gets this big) stay
    # connected through any surviving hub
    note_capped_bucket("simhash", n, max_all_pairs)
    h = max(1, min(n - 1, max_all_pairs * max_all_pairs // (2 * n)))
    hub_idx = np.unique(np.linspace(0, n - 1, h).astype(np.int64))
    d = _hamming_matrix(sigs[hub_idx], sigs)
    hi, mj = np.nonzero(d <= max_hamming)
    a, b = ids[hub_idx[hi]], ids[mj]
    keep = a != b
    return (pd.DataFrame({"a": np.minimum(a, b)[keep],
                          "b": np.maximum(a, b)[keep]})
            .drop_duplicates(ignore_index=True))


def simhash_clusters(docs_ds, max_hamming: int = 3, id_col: str = "doc_id",
                     text_col: str = "text") -> pd.DataFrame:
    """SimHash near-dup: band the 64-bit signature into 4 x 16-bit keys
    (any pair within Hamming distance 3 shares at least one exact band by
    pigeonhole), bucket-groupby per band, verify Hamming ≤ ``max_hamming``
    inside buckets, then min-label clusters.

    Bounded-recall caveat: there is no per-pair verification stage after
    the bucket pairing, so in a band bucket larger than the 512-doc
    all-pairs budget the multi-hub fallback can drop a pair whose members
    are within ``max_hamming`` of each other but farther than
    ``max_hamming`` from every hub.  That requires a giant HETEROGENEOUS
    bucket — giant band buckets are near-identical signatures in practice
    — and each occurrence is logged/counted per worker process
    (:func:`note_capped_bucket`, kind ``"simhash"``), so capped-recall
    events are observable rather than silent."""

    from pawpaw_ray.stages.cc import cc_labels_pandas
    from pawpaw_ray.tuning import shuffle_buckets

    n_buckets = shuffle_buckets()

    def sig_batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        sigs = simhash64_many(b[text_col].to_pylist())
        bands = np.tile(np.arange(4, dtype=np.int32), len(ids))
        rep_sigs = np.repeat(sigs, 4)
        keys = (rep_sigs >> (bands.astype(np.uint64) * np.uint64(16))) \
            & np.uint64(0xFFFF)
        # cluster-sized shuffle bucket over (band, band_key): one partition
        # per bucket instead of one tiny sort-group per distinct band key
        bucket = ((keys * np.uint64(0x9E3779B97F4A7C15)
                   + bands.astype(np.uint64))
                  % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            id_col: pa.array(np.repeat(ids, 4), pa.int64()),
            "band": pa.array(bands, pa.int32()),
            "band_key": pa.array(keys, pa.uint64()),
            "bucket": pa.array(bucket, pa.int32()),
            "simhash64": pa.array(rep_sigs, pa.uint64()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated(["band", "band_key"], keep=False)]  # collisions only
        frames = [_simhash_band_pairs(sub, max_hamming, id_col)
                  for _, sub in g.groupby(["band", "band_key"], sort=False)]
        if not frames:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.concat(frames, ignore_index=True)

    # materialize the (small) signature table so the size gate's count does
    # not re-execute a computed upstream lineage (cf. _lsh_pairs)
    sigs = docs_ds.map_batches(sig_batch, batch_format="pyarrow").materialize()
    if sigs.count() <= SMALL_BAND_ROWS:  # size gate, cf. _lsh_pairs
        pairs = sigs.repartition(1).map_batches(
            bucket_pairs, batch_format="pandas", batch_size=None)
    else:
        pairs = (sigs.groupby("bucket")
                 .map_groups(bucket_pairs, batch_format="pandas"))
    return cc_labels_pandas(pairs, docs_ds.select_columns([id_col]), id_col)
