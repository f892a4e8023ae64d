"""Textstats kernels: vectorized fingerprint64 + batch fingerprints."""

import numpy as np
import pyarrow as pa


def test_fingerprint64_pinned_and_vectorized():
    """Pinned values for the sliding-window splitmix64 fingerprint (any
    kernel change must be deliberate), incl. empty / sub-8-byte padding."""
    from pawpaw_ray.stages.textstats import fingerprint64

    assert fingerprint64("") == 0
    assert fingerprint64("abc") == 14748925474485784209
    long = ("word7 ") * 700
    assert fingerprint64(long) == fingerprint64(long + "ignored past 4KiB")
    # min-of-windows: adding content can only lower (or keep) the value
    assert fingerprint64("abcdefghij" * 4) <= fingerprint64("abcdefgh")


def test_fingerprint_batch_columns():
    from pawpaw_ray.stages.textstats import fingerprint64, fingerprint_batch

    b = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["Hello   World", "hello world"]})
    out = fingerprint_batch(b)
    # whitespace-normalized + casefolded: both rows fingerprint identically
    assert out["content_sha1"][0].as_py() == out["content_sha1"][1].as_py()
    assert (out["fingerprint64"][0].as_py() == out["fingerprint64"][1].as_py()
            == fingerprint64("hello world"))


def test_token_count_ds_tokenizer_hook_parity(ray_session):
    """Actor-pool tokenizer path equals the vectorized regex default when
    given an equivalent counter; a different tokenizer is honored."""
    import pandas as pd
    import ray.data as rd
    import regex as rx

    from pawpaw_ray.stages.textstats import TOKEN_PATTERN, token_count_ds

    df = pd.DataFrame({
        "doc_id": list(range(40)),
        "text": [f"doc {i} with some words x{i}" * (i % 4) for i in range(40)],
    })

    def regex_equiv():
        pat = rx.compile(TOKEN_PATTERN)
        return lambda texts: [len(pat.findall(t)) for t in texts]

    base = (token_count_ds(rd.from_pandas(df)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    hooked = (token_count_ds(rd.from_pandas(df), tokenizer=regex_equiv,
                             tokenizer_concurrency=2).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, hooked)

    ws = (token_count_ds(rd.from_pandas(df),
                         tokenizer=lambda: (lambda ts: [len(t.split())
                                                        for t in ts]))
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (ws["n_tokens"].to_numpy()
            == df["text"].str.split().str.len().to_numpy()).all()


def test_repetition_stats_vs_naive():
    """Vectorized repetition kernel == per-doc Counter reference on edge
    cases: empty doc, single token, punctuation-split, repeated bigrams."""
    import collections
    import re

    from pawpaw_ray.stages.textstats import repetition_stats_batch

    texts = ["The cat the cat sat", "", "a", "x y x y x",
             "  hello,world hello ", "one-two one two_three two_three",
             "spam " * 50]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": texts})
    out = repetition_stats_batch(batch).to_pydict()

    for i, t in enumerate(texts):
        toks = re.findall(r"[A-Za-z0-9_]+", t.lower())
        wc = collections.Counter(toks)
        bc = collections.Counter(zip(toks, toks[1:]))
        exp = (len(toks), len(wc), max(wc.values()) if wc else 0,
               sum((c - 1) * len(w) for w, c in wc.items()),
               max(bc.values()) if bc else 0)
        got = tuple(out[c][i] for c in
                    ("n_words", "n_distinct_words", "top_word_n",
                     "dup_word_chars", "top_bigram_n"))
        assert got == exp, (i, t, got, exp)


def test_common_ngrams_vs_naive(ray_session):
    """Distributed n-gram commonness == per-doc set arithmetic, including
    a doc too short to have any 3-gram (zero row must still appear)."""
    import collections
    import re

    import ray.data as rd

    from pawpaw_ray.stages.textstats import common_ngrams

    texts = ["a b c d a b c", "b c d e f", "a b c x y z", "hi",
             "x y z b c d", "", "a b c d e f g"]
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": texts})).repartition(3)
    out = (common_ngrams(ds, n=3, min_docs=2, n_buckets=4)
           .to_pandas().set_index("doc_id").sort_index())

    shingles = {}
    for i, t in enumerate(texts):
        toks = re.findall(r"[A-Za-z0-9_]+", t.lower())
        shingles[i] = {" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}
    df_count = collections.Counter(s for ss in shingles.values() for s in ss)
    for i in ids:
        exp_n = len(shingles[i])
        exp_c = sum(1 for s in shingles[i] if df_count[s] >= 2)
        assert out.loc[i, "n_shingles"] == exp_n, i
        assert out.loc[i, "n_common"] == exp_c, i
    assert len(out) == len(ids)


def test_top_terms_vs_naive(ray_session):
    """Distributed tf/ctf top-k == naive scoring with identical tie rules
    (score desc, token asc); short docs yield fewer than k rows."""
    import collections
    import re

    import ray.data as rd

    from pawpaw_ray.stages.textstats import top_terms

    texts = ["apple apple banana common common common",
             "banana cherry cherry common",
             "apple cherry date date date common common",
             "zed", ""]
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": texts})).repartition(2)
    out = (top_terms(ds, k=3, n_buckets=4).to_pandas()
           .sort_values(["doc_id", "rk"]).reset_index(drop=True))

    tf = {i: collections.Counter(re.findall(r"[A-Za-z0-9_]+", t.lower()))
          for i, t in enumerate(texts)}
    ctf = collections.Counter()
    for c in tf.values():
        ctf.update(c)
    for i in ids:
        rows = out[out["doc_id"] == i]
        exp = sorted(tf[i].items(), key=lambda kv: (-kv[1] / ctf[kv[0]], kv[0]))[:3]
        assert len(rows) == len(exp), i
        for rk, ((w, f), (_, r)) in enumerate(zip(exp, rows.iterrows()), 1):
            assert (r["token"], r["tf"], r["ctf"], r["rk"]) == (w, f, ctf[w], rk), i


def test_common_ngrams_block_and_bucket_invariance(ray_session):
    """Output is independent of block count and shuffle fan-out, including
    a hot n-gram shared by EVERY doc (one giant h-group in one bucket)."""
    import ray.data as rd

    from pawpaw_ray.stages.textstats import common_ngrams

    boiler = "all rights reserved contact us for details"
    texts = [f"doc {i} body text {i % 7} {boiler}" for i in range(60)]
    t = pa.table({"doc_id": pa.array(range(60), pa.int64()), "text": texts})

    outs = []
    for parts, nb in ((1, 2), (6, 16)):
        ds = rd.from_arrow(t).repartition(parts)
        outs.append(common_ngrams(ds, n=3, min_docs=3, n_buckets=nb)
                    .to_pandas().sort_values("doc_id").reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # the boilerplate tail is common to all docs
    assert (outs[0]["n_common"] >= 5).all()


def test_top_terms_block_and_bucket_invariance(ray_session):
    import pandas as pd
    import ray.data as rd

    from pawpaw_ray.stages.textstats import top_terms

    rng = np.random.RandomState(13)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=25)) for _ in range(80)]
    t = pa.table({"doc_id": pa.array(range(80), pa.int64()), "text": texts})

    outs = []
    for parts, nb in ((1, 2), (5, 16)):
        ds = rd.from_arrow(t).repartition(parts)
        outs.append(top_terms(ds, k=4, n_buckets=nb).to_pandas()
                    .sort_values(["doc_id", "rk"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_heavy_hitters_vs_exact(ray_session):
    """Two-pass MG heavy hitters == brute-force exact filter, including
    with a DELIBERATELY tiny sketch (the MG survival bound, not sketch
    capacity, is what guarantees no true heavy hitter is lost)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pawpaw_ray.stages.textstats import heavy_hitters

    rng = np.random.default_rng(43)
    # zipf-ish vocabulary: few very hot tokens + a long tail
    vocab = [f"tok{i}" for i in range(400)]
    probs = np.array([1.0 / (i + 2) for i in range(400)])
    probs /= probs.sum()
    texts = [" ".join(rng.choice(vocab, size=40, p=probs))
             for _ in range(300)]
    df = pd.DataFrame({"doc_id": np.arange(300), "text": texts})

    t_k = 50
    got = heavy_hitters(rd.from_pandas(df), threshold_k=t_k,
                        n_buckets=4)
    # exact reference
    all_toks = pd.Series(" ".join(texts).split())
    vc = all_toks.value_counts()
    want = vc[vc > len(all_toks) / t_k].sort_index()
    assert got.token.tolist() == list(want.index)
    assert got.n.tolist() == list(want.values)

    # minimal legal sketch: sketch_k = threshold_k still finds every hitter
    got2 = heavy_hitters(rd.from_pandas(df), threshold_k=t_k,
                         sketch_k=t_k, n_buckets=4)
    assert got2.token.tolist() == list(want.index)
    assert got2.n.tolist() == list(want.values)
