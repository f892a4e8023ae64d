"""Text-analysis operators over a documents table (training-data pipeline
building blocks): token counting, quality scoring, language-ID heuristic,
document fingerprinting.  All are stateless vectorized ``map_batches``
transforms over Arrow batches (``pyarrow.compute`` kernels where possible).
"""

from __future__ import annotations

import hashlib

import numpy as np
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
    # split on non-token runs: "" entries at the edges mark leading/
    # trailing separators — dropped below, leaving exactly the
    # findall(TOKEN_PATTERN) token sequence in document order
    parts = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]),
                                   "[^a-z0-9_]+")
    la = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
    # sliced-ListArray discipline: offsets are absolute into .values, so
    # always pair them (never .flatten() alongside raw offsets)
    offs = np.asarray(la.offsets)
    words = np.asarray(la.values.to_pandas(), dtype=object)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    keep = words != ""
    df = pd.DataFrame({"i": doc_idx[keep], "w": words[keep]})

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
