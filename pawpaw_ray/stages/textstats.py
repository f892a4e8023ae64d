"""Text-analysis operators over a documents table (training-data pipeline
building blocks): token counting, quality scoring, language-ID heuristic,
document fingerprinting, repetition metrics.  Per-document metrics are
stateless vectorized ``map_batches`` transforms over Arrow batches
(``pyarrow.compute`` kernels where possible); the corpus-level operators
(:func:`common_ngrams`, :func:`top_terms`) are join-free bucketed-groupby
pipelines with no broadcast state and no driver-side vocabulary.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import regex as rx

from pawpaw_ray.stages.dedup import _splitmix64

# RE2-compatible token pattern (shared verbatim with the DuckDB oracle SQL)
TOKEN_PATTERN = r"[A-Za-z0-9_]+"
_TOKEN_RX = rx.compile(TOKEN_PATTERN)

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "den", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "por"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text",
                      out_col: str = "n_tokens") -> pa.Table:
    """Vectorized token count (Arrow C++ kernel, no Python loop)."""
    n = pc.count_substring_regex(batch[text_col], TOKEN_PATTERN)
    return batch.append_column(out_col, pc.cast(n, pa.int64()))


def token_count_ds(ds, text_col: str = "text", out_col: str = "n_tokens",
                   tokenizer=None, tokenizer_concurrency=(1, 8)):
    """Token-count stage with a pluggable tokenizer.

    Default: the vectorized Arrow regex proxy (:func:`token_count_batch`)
    on a plain task pool.  ``tokenizer`` is a ZERO-ARG factory returning a
    callable ``list[str] -> list[int]`` (token count per text); when given,
    counting runs as an ACTOR-POOL ``map_batches`` stage — the factory
    runs once per actor in ``__init__`` (the load-a-real-BPE-once
    pattern), batches flow through ``__call__``.  The same hook shape as
    ``curation.token_pack(tokenizer=...)``.
    """
    if tokenizer is None:
        return ds.map_batches(
            lambda b: token_count_batch(b, text_col, out_col),
            batch_format="pyarrow")

    class _TokenizerCounter:
        def __init__(self):
            self.count = tokenizer()

        def __call__(self, b: pa.Table) -> pa.Table:
            ns = self.count([t or "" for t in b[text_col].to_pylist()])
            return b.append_column(out_col, pa.array(ns, pa.int64()))

    return ds.map_batches(_TokenizerCounter, batch_format="pyarrow",
                          concurrency=tokenizer_concurrency)


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-scoring metrics: char/token counts, punctuation & uppercase
    counts, mean token length.  Integer metrics are exact (SQL-checkable);
    the ratio is float for human use."""
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_PATTERN), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, r"[.!?,;:]"), pa.int64())
    n_upper = pc.cast(pc.count_substring_regex(text, r"[A-Z]"), pa.int64())
    token_chars = pc.cast(pc.count_substring_regex(text, r"[A-Za-z0-9_]"), pa.int64())
    mean_tok = pc.if_else(
        pc.greater(n_tokens, 0),
        pc.divide(pc.cast(token_chars, pa.float64()), pc.cast(n_tokens, pa.float64())),
        pa.scalar(0.0))
    t = batch
    for name, col in [("n_chars_calc", n_chars), ("n_tokens", n_tokens),
                      ("n_punct", n_punct), ("n_upper", n_upper),
                      ("mean_token_len", mean_tok)]:
        t = t.append_column(name, col)
    return t


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-vote language ID (n-gram-free heuristic; deterministic).
    Emits the winning language code or 'und'."""
    out = []
    for text in batch[text_col].to_pylist():
        toks = set(t.lower() for t in _TOKEN_RX.findall(text or "")[:200])
        best, best_n = "und", 0
        for lang in sorted(_STOPWORDS):
            n = len(toks & _STOPWORDS[lang])
            if n > best_n:
                best, best_n = lang, n
        out.append(best)
    return batch.append_column("lang_pred", pa.array(out, pa.string()))


def _flat_tokens(batch: pa.Table, text_col: str):
    """Flat ``(doc_idx, token)`` numpy arrays for a batch, in document
    order: one Arrow ``utf8_lower`` + ``split_pattern_regex`` per batch,
    no per-row Python loop.  Tokenization is ``lower`` + ``[a-z0-9_]+`` —
    identical to ``TOKEN_PATTERN``+lower on ASCII (the fixtures; non-ASCII
    caveat as in :func:`fingerprint_batch`)."""
    n = batch.num_rows
    # split on non-token runs: "" entries at the edges mark leading/
    # trailing separators — dropped below, leaving exactly the
    # findall(TOKEN_PATTERN) token sequence in document order
    parts = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]),
                                   "[^a-z0-9_]+")
    la = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
    # sliced-ListArray discipline: .offsets are slice-relative while
    # .values is the FULL child — pair flatten() (slice-aware) with
    # offsets rebased to 0 so an offset>0 input can't misalign doc_idx
    offs = np.asarray(la.offsets, dtype=np.int64)
    offs = offs - offs[0]
    words = np.asarray(la.flatten().to_pandas(), dtype=object)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    keep = words != ""
    return doc_idx[keep], words[keep]


def repetition_stats_batch(batch: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Gopher-style repetition metrics per document (quality-filter inputs:
    high top-word / top-bigram / duplicate-word fractions flag boilerplate
    and degenerate generations).  All-integer outputs so the DuckDB oracle
    compares exactly; callers derive the ratios.

    Columns: ``n_words`` (token count), ``n_distinct_words``,
    ``top_word_n`` (occurrences of the most frequent token),
    ``top_bigram_n`` (occurrences of the most frequent adjacent token
    pair), ``dup_word_chars`` (chars in token occurrences beyond each
    token's first — the numerator of Gopher's duplicate-content fraction).

    Fully vectorized: one Arrow ``utf8_lower`` + ``split_pattern_regex``
    per batch, then flat numpy/pandas group-aggregations — no per-row
    Python loop.  Tokenization is ``lower`` + ``[a-z0-9_]+``, identical to
    ``TOKEN_PATTERN``+lower on ASCII (the fixtures; non-ASCII caveat as in
    :func:`fingerprint_batch`).
    """
    import pandas as pd

    n = batch.num_rows
    doc_idx, words = _flat_tokens(batch, text_col)
    df = pd.DataFrame({"i": doc_idx, "w": words})

    zeros = pd.Series(0, index=pd.RangeIndex(n), dtype="int64")

    wc = df.groupby(["i", "w"], sort=False).size().reset_index(name="c")
    g = wc.groupby("i", sort=False)
    wlen = wc["w"].str.len().astype("int64")
    per = pd.DataFrame({
        "n_words": g["c"].sum(),
        "n_distinct_words": g["c"].size(),
        "top_word_n": g["c"].max(),
        "dup_word_chars": (wc["c"] * wlen - wlen).groupby(wc["i"]).sum(),
    }).reindex(pd.RangeIndex(n), fill_value=0).astype("int64")

    # adjacent-token bigrams: consecutive flat rows within the same doc
    iv, wv = df["i"].to_numpy(), df["w"].to_numpy()
    same = iv[:-1] == iv[1:] if len(iv) else np.zeros(0, dtype=bool)
    bg = pd.DataFrame({
        "i": iv[:-1][same],
        "b": pd.Series(wv[:-1][same]) + " " + pd.Series(wv[1:][same]),
    })
    top_bg = (bg.groupby(["i", "b"], sort=False).size().groupby("i").max()
              .reindex(pd.RangeIndex(n), fill_value=0).astype("int64")
              if len(bg) else zeros)

    t = batch.select([id_col])
    for name in ("n_words", "n_distinct_words", "top_word_n",
                 "dup_word_chars"):
        t = t.append_column(name, pa.array(per[name].to_numpy(), pa.int64()))
    return t.append_column("top_bigram_n",
                           pa.array(top_bg.to_numpy(), pa.int64()))


def fingerprint64(norm: str) -> int:
    """64-bit document fingerprint: min of splitmix64-mixed sliding 8-byte
    windows over the first 4 KiB of the normalized text — the min-of-window-
    hashes shape shared with winnowing/minhash sketches.  Fully vectorized:
    the windows are assembled with 8 shifted uint64 slice-adds (no per-byte
    Python loop; the round-2 per-byte FNV kernel was ~200x slower per MB,
    see BASELINE.md)."""
    buf = norm[:4096].encode()
    if not buf:
        return 0
    a = np.frombuffer(buf.ljust(8, b"\0"), dtype=np.uint8).astype(np.uint64)
    n = len(a)
    w = np.zeros(n - 7, dtype=np.uint64)
    for k in range(8):
        w |= a[k:n - 7 + k] << np.uint64(8 * k)
    return int(_splitmix64(w).min())


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Content fingerprints: sha1/sha256 of the normalized text (exact-dup
    keys) and the 64-bit sliding-window fingerprint (:func:`fingerprint64`).

    Normalization is ``str.split()`` + ``casefold()``; the DuckDB oracle
    approximates it with regex ``\\s`` + ``lower()`` — identical on ASCII
    (the synthetic fixtures), divergent on e.g. 'ß' or U+00A0.  The kernel
    is the semantics; the SQL is the ASCII-fixture check."""
    sha, sha256, rolling = [], [], []
    for text in batch[text_col].to_pylist():
        norm = " ".join((text or "").split()).casefold()
        sha.append(hashlib.sha1(norm.encode()).hexdigest())
        sha256.append(hashlib.sha256(norm.encode()).hexdigest())
        rolling.append(fingerprint64(norm))
    return (batch.append_column("content_sha1", pa.array(sha, pa.string()))
                 .append_column("content_sha256", pa.array(sha256, pa.string()))
                 .append_column("fingerprint64", pa.array(rolling, pa.uint64())))


# ---------------------------------------------------------------------------
# corpus-level text analysis: cross-doc n-gram commonness, distinctive terms
# ---------------------------------------------------------------------------


def _hash_strings(arr) -> "np.ndarray":
    """Vectorized 64-bit string hashing (pandas siphash with the library's
    fixed default key): deterministic across processes within one run —
    these hashes are ENGINE-INTERNAL shuffle keys only, never persisted and
    never compared against the SQL oracle (which works on the raw
    strings).  Collision odds at 64 bits are the standard accepted risk of
    hash-based dedup (CCNet/Gopher style): ~m^2/2^65 for m distinct keys."""
    import pandas as pd

    return pd.util.hash_array(np.asarray(arr, dtype=object))


def common_ngrams(ds, n: int = 3, min_docs: int = 3, id_col: str = "doc_id",
                  text_col: str = "text", n_buckets: int | None = None):
    """Cross-document n-gram commonness (the CCNet/C4-style boilerplate
    signal, word-n-gram unit): per document, how many of its DISTINCT word
    ``n``-grams appear in at least ``min_docs`` distinct documents
    corpus-wide.  Output ``(id_col, n_shingles, n_common)`` — all-integer,
    so the DuckDB oracle compares exactly; ``n_common / n_shingles`` is the
    boilerplate fraction a quality filter thresholds on.

    Scale shape — join-free, broadcast-free, no driver state:

    1. one corpus scan emits distinct ``(doc, h)`` pairs per document
       (vectorized n-gram construction + siphash);
    2. groupby on ``h % n_buckets`` — document frequency per n-gram is a
       vectorized ``transform('size')`` WITHIN each pandas bucket group
       (the bucketed-groupby discipline: never one task per n-gram), and
       each bucket task reduces to per-(bucket, doc) partial counts;
    3. a doc-bucketed groupby merges the partials (bucketed ``map_groups``
       with a vectorized in-group sum — Ray's native ``aggregate(Sum)``
       accumulates per row in Python and measured ~30x slower here).

    The pair table (~corpus token count) crosses the cluster twice — the
    inherent cost of an exact global document-frequency count; there is no
    frequent-set broadcast whose size would scale with the corpus (at Web
    scale the >=min_docs n-gram set is itself in the billions).

    Documents with fewer than ``n`` tokens ride along as ``real=False``
    zero rows (excluded from frequency counts) so every input document
    gets an output row, matching the oracle's LEFT JOIN.
    """
    import pandas as pd

    from pawpaw_ray.tuning import shuffle_buckets

    n_buckets = n_buckets or shuffle_buckets()

    def pairs_batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        di, words = _flat_tokens(b, text_col)
        m = len(words) - n + 1
        if m > 0:
            grams = words[:m].copy()
            for j in range(1, n):
                grams = grams + " " + words[j:m + j]
            within = di[:m] == di[n - 1:]  # windows crossing docs out
            df = (pd.DataFrame({"i": di[:m][within],
                                "h": _hash_strings(grams[within])})
                  .drop_duplicates())
        else:
            df = pd.DataFrame({"i": np.empty(0, np.int64),
                               "h": np.empty(0, np.uint64)})
        # zero-shingle docs: real=False rows so they surface downstream
        have = np.zeros(len(ids), dtype=bool)
        have[df["i"].to_numpy(np.int64)] = True
        empty_i = np.flatnonzero(~have)
        doc = np.concatenate([ids[df["i"].to_numpy(np.int64)], ids[empty_i]])
        # int64 bit-view: Ray's sort shuffle mishandles uint64 > 2^63
        h = np.concatenate([df["h"].to_numpy(np.uint64).view(np.int64),
                            np.zeros(len(empty_i), np.int64)])
        real = np.concatenate([np.ones(len(df), bool),
                               np.zeros(len(empty_i), bool)])
        return pa.table({id_col: pa.array(doc, pa.int64()),
                         "h": pa.array(h, pa.int64()),
                         "hbucket": pa.array(h % n_buckets, pa.int32()),
                         "real": pa.array(real, pa.bool_())})

    def bucket_partials(g: pd.DataFrame) -> pd.DataFrame:
        real = g[g["real"]]
        # pairs are distinct per doc, so the h-group size IS the distinct
        # document frequency of that n-gram
        common = real["h"].groupby(real["h"]).transform("size") >= min_docs
        per = pd.DataFrame({
            "n_shingles": real.groupby(real[id_col], sort=False)["h"].size(),
            "n_common": common.groupby(real[id_col].to_numpy()).sum(),
        })
        fake = g.loc[~g["real"], id_col].unique()
        per = per.reindex(per.index.union(fake), fill_value=0)
        ids_out = per.index.to_numpy(np.int64)
        return pd.DataFrame({id_col: ids_out,
                             "n_shingles": per["n_shingles"].to_numpy(np.int64),
                             "n_common": per["n_common"].to_numpy(np.int64),
                             "dbucket": (ids_out % n_buckets).astype(np.int32)})

    def merge_doc_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(id_col, sort=False)[["n_shingles", "n_common"]]
                .sum().reset_index())
        return out.astype({id_col: "int64", "n_shingles": "int64",
                           "n_common": "int64"})

    return (ds.map_batches(pairs_batch, batch_format="pyarrow")
              .groupby("hbucket")
              .map_groups(bucket_partials, batch_format="pandas")
              .groupby("dbucket")
              .map_groups(merge_doc_bucket, batch_format="pandas"))


def top_terms(ds, k: int = 5, id_col: str = "doc_id",
              text_col: str = "text", n_buckets: int | None = None):
    """Per-document distinctive-term extraction: the ``k`` tokens with the
    highest ``tf / ctf`` (term frequency over corpus frequency — a
    monotone rank proxy for per-doc KL contribution), ties broken by token
    ascending.  Output ``(id_col, rk, token, tf, ctf)``.

    Rank determinism across engines: ``tf`` and ``ctf`` are exact int64,
    and the score is ONE IEEE-double division of those integers —
    correctly rounded, hence bit-identical in numpy and the DuckDB oracle;
    the float itself never leaves the operator.

    Scale shape — join-free, broadcast-free, no driver-side vocabulary
    (a Web-scale type count is ~1e9, too big to ship to every worker):

    1. one corpus scan emits per-doc term frequencies ``(doc, token, tf)``
       (map-side combine: one pandas groupby per batch);
    2. groupby on ``hash(token) % n_buckets`` — corpus frequency is a
       vectorized ``transform('sum')`` within each pandas bucket group;
    3. groupby on ``doc % n_buckets`` — per-doc top-k is a vectorized
       sort + ``groupby.head(k)`` within each bucket group.

    The tf table crosses the cluster twice (term-bucket, then doc-bucket);
    both shuffles move ~distinct (doc, token) pairs, already combined
    below the corpus token count.
    """
    import pandas as pd

    from pawpaw_ray.tuning import shuffle_buckets

    n_buckets = n_buckets or shuffle_buckets()

    def tf_batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        di, words = _flat_tokens(b, text_col)
        tf = (pd.DataFrame({"i": di, "w": words})
              .groupby(["i", "w"], sort=False).size().reset_index(name="tf"))
        wb = (_hash_strings(tf["w"].to_numpy()) % n_buckets).astype(np.int32)
        return pa.table({
            id_col: pa.array(ids[tf["i"].to_numpy(np.int64)], pa.int64()),
            "token": pa.array(tf["w"].to_numpy(object), pa.string()),
            "tf": pa.array(tf["tf"].to_numpy(np.int64), pa.int64()),
            "wbucket": pa.array(wb, pa.int32()),
        })

    def add_ctf(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["ctf"] = g.groupby("token", sort=False)["tf"].transform("sum")
        g["dbucket"] = (g[id_col].to_numpy(np.int64) % n_buckets).astype(np.int32)
        return g[[id_col, "token", "tf", "ctf", "dbucket"]]

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        # one correctly-rounded double division of exact int64s: the same
        # bits the oracle's CAST(tf AS DOUBLE)/ctf produces
        g["score"] = g["tf"].to_numpy(np.float64) / g["ctf"].to_numpy(np.float64)
        g = g.sort_values([id_col, "score", "token"],
                          ascending=[True, False, True], kind="mergesort")
        top = g.groupby(id_col, sort=False).head(k).copy()
        top["rk"] = top.groupby(id_col, sort=False).cumcount() + 1
        out = top[[id_col, "rk", "token", "tf", "ctf"]]
        return out.astype({id_col: "int64", "rk": "int64",
                           "tf": "int64", "ctf": "int64"})

    return (ds.map_batches(tf_batch, batch_format="pyarrow")
              .groupby("wbucket").map_groups(add_ctf, batch_format="pandas")
              .groupby("dbucket").map_groups(topk_bucket, batch_format="pandas"))


# ---------------------------------------------------------------------------
# two-pass exact heavy hitters (mergeable Misra-Gries sketch + recount)
# ---------------------------------------------------------------------------

def _mg_reduce(tokens: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries reduction to at most ``k`` counters: subtract the
    (k+1)-th largest count from every counter and drop the non-positive
    ones.  Classic guarantee: an item's counter is decremented at most
    ``n/(k+1)`` in total across all reductions, so any item with true
    frequency > n/(k+1) keeps a positive counter."""
    if len(tokens) <= k:
        return tokens, counts
    dec = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    keep = counts > dec
    return tokens[keep], counts[keep] - dec


def heavy_hitters(ds, threshold_k: int = 100, sketch_k: int | None = None,
                  text_col: str = "text", n_buckets: int | None = None):
    """All tokens with global count > ``n_total / threshold_k``, with
    EXACT counts — in two bounded-memory passes, never a full
    token-frequency table (which is vocabulary-sized at 100 TB):

    1. **Sketch**: per-batch Misra-Gries over the batch's token counts
       (``sketch_k`` counters, default ``4 x threshold_k``), partial
       sketches merged per token-hash bucket (sum by token, then one more
       MG reduction).  MG summaries are mergeable (Agarwal et al. 2012,
       "Mergeable Summaries" — public result): any token with global
       frequency > n_total/(sketch_k+1) survives to the candidate union,
       a strict superset of the report set since sketch_k > threshold_k.
       The driver pulls at most ``n_buckets x sketch_k`` candidate rows.
    2. **Recount**: exact counts for the (small, broadcast) candidate set
       plus the global token total via one vectorized ``np.isin`` pass,
       merged in-cluster; the final strict ``n > n_total / threshold_k``
       filter runs on the candidate-sized table — output is EXACT and
       deterministic regardless of sketch-internal tie-breaking, because
       the sketch only proposes candidates, never counts.

    Returns a pandas DataFrame ``(token, n)``.
    """
    import ray

    from pawpaw_ray.tuning import hash_bucket, shuffle_buckets
    n_buckets = n_buckets or shuffle_buckets(multiplier=1)
    sketch_k = sketch_k or 4 * threshold_k

    def sketch_batch(b: pa.Table) -> pd.DataFrame:
        _, words = _flat_tokens(b, text_col)
        vc = pd.Series(words).value_counts()
        toks, cnts = _mg_reduce(vc.index.to_numpy(object),
                                vc.to_numpy(np.int64), sketch_k)
        return pd.DataFrame({"token": toks, "c": cnts,
                             "sbucket": hash_bucket(toks, n_buckets)})

    def sketch_merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", sort=False)["c"].sum()
        toks, cnts = _mg_reduce(s.index.to_numpy(object),
                                s.to_numpy(np.int64), sketch_k)
        return pd.DataFrame({"token": toks})

    cand = np.sort((ds.map_batches(sketch_batch, batch_format="pyarrow")
                    .groupby("sbucket")
                    .map_groups(sketch_merge, batch_format="pandas")
                    .to_pandas())["token"].to_numpy(object))
    cand_ref = ray.put(cand)

    # cannot collide: real tokens match lowered [a-z0-9_]+ (no '#', no
    # uppercase).  NUL-based sentinels are a trap — a trailing \x00 is
    # silently stripped somewhere in the Arrow<->pandas block roundtrip.
    _TOTAL = "##TOTAL##"

    def recount_batch(b: pa.Table) -> pd.DataFrame:
        from pawpaw_ray.state.broadcast import cached_get
        cset = cached_get(cand_ref)
        _, words = _flat_tokens(b, text_col)
        vc = pd.Series(words[np.isin(words, cset)]).value_counts()
        toks = np.append(vc.index.to_numpy(object), _TOTAL)
        cnts = np.append(vc.to_numpy(np.int64), np.int64(len(words)))
        return pd.DataFrame({"token": toks, "c": cnts,
                             "rbucket": hash_bucket(toks, n_buckets)})

    def recount_merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("token", sort=False)["c"].sum().reset_index()
        out["c"] = out["c"].astype(np.int64)
        return out

    counts = (ds.map_batches(recount_batch, batch_format="pyarrow")
              .groupby("rbucket")
              .map_groups(recount_merge, batch_format="pandas")
              .to_pandas())
    n_total = int(counts.loc[counts["token"] == _TOTAL, "c"].sum())
    hits = counts[(counts["token"] != _TOTAL)
                  & (counts["c"] > n_total / threshold_k)]
    return (pd.DataFrame({"token": hits["token"].to_numpy(object),
                          "n": hits["c"].to_numpy(np.int64)})
            .sort_values("token").reset_index(drop=True))
