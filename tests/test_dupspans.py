"""Exact duplicated-substring spans (stages/dupspans.py): rolling-hash
kernel vs direct window hashing, and the distributed operator vs a naive
per-corpus Python oracle (and the driver's DuckDB SQL on tricky fixtures)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pawpaw_ray.stages.dupspans import _rolling_hashes, dup_spans

K = 5


def _naive_spans(docs: dict[int, str], k: int) -> pd.DataFrame:
    """Direct oracle: count every k-gram, mark duplicated positions, merge
    overlap-or-touch intervals per doc."""
    from collections import Counter

    counts = Counter(t[i:i + k] for t in docs.values()
                     for i in range(len(t) - k + 1))
    rows = []
    for d, t in sorted(docs.items()):
        hits = [i for i in range(len(t) - k + 1) if counts[t[i:i + k]] >= 2]
        start = end = None
        for i in hits:
            if start is None:
                start, end = i, i + k
            elif i <= end:          # overlap or touch
                end = i + k
            else:
                rows.append((d, start, end))
                start, end = i, i + k
        if start is not None:
            rows.append((d, start, end))
    return pd.DataFrame(rows, columns=["doc_id", "span_start", "span_end"])


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return (df[["doc_id", "span_start", "span_end"]]
            .astype(np.int64)
            .sort_values(["doc_id", "span_start"])
            .reset_index(drop=True))


def test_rolling_hashes_match_direct_window_hash():
    texts = ["abcdefgh", "xxabcdexx", "", "abc", "ööabcäbc"]
    di, pos, h = _rolling_hashes(texts, K)
    # same window text -> same hash, regardless of doc / offset
    grams = [texts[d][p:p + K] for d, p in zip(di, pos)]
    by_gram = {}
    for g, hv in zip(grams, h.tolist()):
        assert by_gram.setdefault(g, hv) == hv
    # distinct windows on this fixture -> distinct hashes
    assert len(set(by_gram.values())) == len(by_gram)
    # position counts: max(len-K+1, 0) per doc, char (not byte) offsets
    want = sum(max(len(t) - K + 1, 0) for t in texts)
    assert len(di) == len(pos) == len(h) == want


def _run(docs: dict[int, str], k: int, **kw) -> pd.DataFrame:
    import ray.data as rd

    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    return _sorted(dup_spans(rd.from_pandas(df), k=k, **kw).to_pandas())


def test_dup_spans_matches_naive(ray_session):
    docs = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "a quick brown fox appears in doc two as well",
        3: "completely unrelated text here",
        4: "zzz the quick brown fox jumps zzz",
        5: "ha",                      # shorter than k
        6: "aaaaaaaaaaaa",            # self-overlapping within-doc repeat
        7: "",                        # empty
    }
    got = _run(docs, K)
    want = _sorted(_naive_spans(docs, K))
    pd.testing.assert_frame_equal(got, want)
    # the within-doc run collapses to one maximal span covering the doc
    assert ((got["doc_id"] == 6) &
            (got["span_start"] == 0) &
            (got["span_end"] == 12)).any()


def test_dup_spans_block_count_invariant(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(11)
    base = ["".join(rng.choice(list("abcd "), 60)) for _ in range(40)]
    # plant shared substrings across docs
    texts = [t + " shared duplicated payload " + base[i % 7][:10]
             for i, t in enumerate(base)]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                       "text": texts})
    a = _sorted(dup_spans(rd.from_pandas(df), k=8).to_pandas())
    b = _sorted(dup_spans(rd.from_pandas(df).repartition(9), k=8,
                          n_buckets=5).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    want = _sorted(_naive_spans(dict(zip(df.doc_id, df.text)), 8))
    pd.testing.assert_frame_equal(a, want)


def test_dup_spans_matches_driver_sql(ray_session):
    """The exact SQL the driver runs at sf0.01 (K=30), on a fixture with
    cross-doc sentence reuse, adjacency/touching intervals, and unicode."""
    rng = np.random.RandomState(3)
    boiler = "This transcript is provided under the standard license terms."
    texts = []
    for i in range(60):
        body = "".join(rng.choice(list("abcdefgh "), 80))
        t = (boiler + " " + body) if i % 3 == 0 else (body + " é" + boiler)
        texts.append(t)
    documents = pd.DataFrame(  # noqa: F841 (duckdb binds by name)
        {"doc_id": np.arange(60, dtype=np.int64), "text": texts})

    from __ray_entry__ import oracle_sql
    want = duckdb.sql(oracle_sql()["dup_spans"]).fetchdf()
    got = _run(dict(zip(documents.doc_id, documents.text)), 30)
    pd.testing.assert_frame_equal(got, _sorted(want))


def test_dup_spans_winnowed_subset(ray_session):
    """sample_mod > 1 (winnowed candidates) yields spans that are each
    contained in some exact span — approximation only loses, never invents."""
    docs = {i: f"filler {i} " + "long duplicated run shared by all docs"
            for i in range(8)}
    exact = _run(docs, 6)
    approx = _run(docs, 6, sample_mod=3)
    ex = {d: list(g[["span_start", "span_end"]].itertuples(index=False))
          for d, g in exact.groupby("doc_id")}
    for r in approx.itertuples(index=False):
        assert any(s <= r.span_start and r.span_end <= e
                   for s, e in ex.get(r.doc_id, []))
