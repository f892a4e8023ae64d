"""Corpus-curation operators (stages/curation.py): deterministic hash
split, stratified sampling, n-gram decontamination.  Differential oracles
are DuckDB SQL over the same in-memory table (the identical expressions the
driver runs at sf0.01)."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pawpaw_ray.stages.curation import (
    _shingle_hashes,
    decontaminate,
    eval_shingle_set,
    hash_split_batch,
    make_decontaminate_batch,
    shuffle_order,
    stratified_sample,
    token_pack,
)


def test_hash_split_matches_sql_and_fractions():
    ids = list(range(20_000))
    out = hash_split_batch(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    got = dict(zip(out["doc_id"].to_pylist(), out["split"].to_pylist()))

    sql = duckdb.sql(
        "SELECT i AS doc_id, CASE "
        "WHEN substr(md5(CAST(i AS VARCHAR)), 1, 4) < 'e666' THEN 'train' "
        "WHEN substr(md5(CAST(i AS VARCHAR)), 1, 4) < 'f333' THEN 'val' "
        "ELSE 'test' END AS split FROM range(20000) t(i)").fetchall()
    assert got == {r[0]: r[1] for r in sql}

    frac = pd.Series(list(got.values())).value_counts(normalize=True)
    assert abs(frac["train"] - 0.90) < 0.01
    assert abs(frac["val"] - 0.05) < 0.005
    assert abs(frac["test"] - 0.05) < 0.005


def test_hash_split_content_independent():
    # same id -> same split regardless of any other column
    t1 = hash_split_batch(pa.table({"doc_id": pa.array([7, 8], pa.int64()),
                                    "text": pa.array(["a", "b"])}))
    t2 = hash_split_batch(pa.table({"doc_id": pa.array([8, 7], pa.int64()),
                                    "text": pa.array(["x", "y"])}))
    m1 = dict(zip(t1["doc_id"].to_pylist(), t1["split"].to_pylist()))
    m2 = dict(zip(t2["doc_id"].to_pylist(), t2["split"].to_pylist()))
    assert m1 == m2


def _sample_frame(n=1000, langs=("en", "de", "fr")):
    rng = np.random.RandomState(7)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(langs, size=n),
    })


def test_stratified_sample_matches_sql_window(ray_session):
    import ray.data as rd

    df = _sample_frame()
    got = (stratified_sample(rd.from_pandas(df), "lang", k=20)
           .to_pandas().sort_values(["lang", "rk"]).reset_index(drop=True))

    want = duckdb.sql(
        "SELECT lang, doc_id, rk FROM ("
        "  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang "
        "    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM df) "
        "WHERE rk <= 20 ORDER BY lang, rk").fetchdf()
    pd.testing.assert_frame_equal(
        got[["lang", "doc_id", "rk"]], want, check_dtype=False)


def test_stratified_sample_block_count_invariant(ray_session):
    import ray.data as rd

    df = _sample_frame(600)
    a = (stratified_sample(rd.from_pandas(df), "lang", k=5)
         .to_pandas().sort_values(["lang", "rk"]).reset_index(drop=True))
    b = (stratified_sample(rd.from_pandas(df).repartition(13), "lang", k=5)
         .to_pandas().sort_values(["lang", "rk"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_shingle_hashes_short_doc_empty():
    assert _shingle_hashes("only five words right here", 8).size == 0
    assert _shingle_hashes("", 8).size == 0
    # exactly n tokens -> one shingle
    assert _shingle_hashes("a b c d e f g h", 8).size == 1


def test_shingle_hashes_distinct_and_case_insensitive():
    # repeated n-gram counted once; tokenization lowercases
    t = "A b c d e f g h " * 3
    assert _shingle_hashes(t, 8).size == 8  # 8 distinct cyclic 8-grams
    assert (sorted(_shingle_hashes("A B C D E F G H", 8))
            == sorted(_shingle_hashes("a b c d e f g h", 8)))


def test_decontaminate_flags_overlap(ray_session):
    import ray.data as rd

    base = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    train = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": [
            base + " extra tail words here",   # shares 8-grams with eval
            "totally different words with no overlap at all whatsoever",
            "short doc",                        # <8 tokens: never flagged
        ],
    })
    ev = pd.DataFrame({
        "doc_id": np.array([100], dtype=np.int64),
        "text": ["prefix words then " + base],
    })
    out = (decontaminate(rd.from_pandas(train), rd.from_pandas(ev))
           .to_pandas().set_index("doc_id").sort_index())
    assert bool(out.loc[1, "contaminated"])
    assert out.loc[1, "n_hit_shingles"] == 1  # only the base 8-gram is shared
    assert not bool(out.loc[2, "contaminated"])
    assert out.loc[2, "n_hit_shingles"] == 0
    assert not bool(out.loc[3, "contaminated"])


def test_decontaminate_counts_match_bruteforce(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(30)]

    def doc(n):
        return " ".join(rng.choice(vocab, size=n))

    train = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [doc(rng.randint(4, 60)) for _ in range(40)],
    })
    ev = pd.DataFrame({
        "doc_id": np.arange(100, 105, dtype=np.int64),
        "text": [doc(rng.randint(10, 60)) for _ in range(5)],
    })

    def shingles(t):
        toks = t.lower().split()
        return {" ".join(toks[i:i + 8]) for i in range(max(0, len(toks) - 7))}

    ev_set = set().union(*[shingles(t) for t in ev["text"]])
    want = {int(r.doc_id): len(shingles(r.text) & ev_set)
            for r in train.itertuples()}

    out = (decontaminate(rd.from_pandas(train).repartition(7),
                         rd.from_pandas(ev))
           .to_pandas())
    got = dict(zip(out["doc_id"].astype(int), out["n_hit_shingles"].astype(int)))
    assert got == want
    assert (out["contaminated"] == (out["n_hit_shingles"] > 0)).all()


def test_decontaminate_empty_eval_set(ray_session):
    import ray.data as rd

    train = pd.DataFrame({"doc_id": np.array([1], dtype=np.int64),
                          "text": ["one two three four five six seven eight"]})
    ev = pd.DataFrame({"doc_id": np.array([], dtype=np.int64),
                       "text": pd.Series([], dtype=str)})
    out = decontaminate(rd.from_pandas(train), rd.from_pandas(ev)).to_pandas()
    assert not out["contaminated"].any()


def test_decontaminate_batch_fn_empty_batch(ray_session):
    import ray
    ref = ray.put(np.array([1, 2, 3], dtype=np.uint64))
    fn = make_decontaminate_batch(ref)
    out = fn(pa.table({"doc_id": pa.array([], pa.int64()),
                       "text": pa.array([], pa.string())}))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "n_hit_shingles", "contaminated"]


def _pack_frame(n=500):
    rng = np.random.RandomState(3)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [" ".join(f"w{j}" for j in range(rng.randint(1, 40)))
                 for _ in range(n)],
    })


def test_token_pack_matches_sql_prefix_scan(ray_session):
    import ray.data as rd

    df = _pack_frame()
    got = (token_pack(rd.from_pandas(df), budget=100, bucket_width=64)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    want = duckdb.sql(
        "WITH t AS (SELECT doc_id, "
        "  len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens FROM df), "
        "s AS (SELECT doc_id, n_tokens, sum(n_tokens) OVER ("
        "  ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS c FROM t) "
        "SELECT doc_id, n_tokens, CAST((c - n_tokens) // 100 AS BIGINT) "
        "AS seq_id FROM s ORDER BY doc_id").fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # a doc is assigned the sequence in which it STARTS: seq_ids are
    # non-decreasing in doc order and start at 0
    assert got["seq_id"].iloc[0] == 0
    assert (got["seq_id"].diff().fillna(0) >= 0).all()


def test_token_pack_invariant_to_blocks_and_bucket_width(ray_session):
    import ray.data as rd

    df = _pack_frame(300)
    a = (token_pack(rd.from_pandas(df), budget=64, bucket_width=64)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (token_pack(rd.from_pandas(df).repartition(11), budget=64,
                    bucket_width=17)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_shuffle_order_matches_sql_rank(ray_session):
    import ray.data as rd

    # non-contiguous ids: the permutation is a function of the id VALUES
    df = pd.DataFrame({"doc_id": np.array([3, 17, 1000, 42, 7, 999_999],
                                          dtype=np.int64)})
    got = (shuffle_order(rd.from_pandas(df))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = duckdb.sql(
        "SELECT doc_id, CAST(row_number() OVER ("
        "  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos "
        "FROM df ORDER BY doc_id").fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_shuffle_order_is_permutation_and_block_invariant(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64)})
    a = (shuffle_order(rd.from_pandas(df))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (shuffle_order(rd.from_pandas(df).repartition(9))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert sorted(a["pos"]) == list(range(1, 2001))  # exact permutation
    # it actually shuffles: positions are not the identity order
    assert (a["pos"].to_numpy() != np.arange(1, 2001)).any()


def test_eval_shingle_set_sorted_unique(ray_session):
    import ray
    import ray.data as rd

    ev = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["a b c d e f g h i", "a b c d e f g h i"],  # identical
    })
    arr = ray.get(eval_shingle_set(rd.from_pandas(ev).repartition(2)))
    assert arr.dtype == np.uint64
    assert arr.size == 2  # two distinct 8-grams, dupes merged
    assert list(arr) == sorted(set(arr))


def test_effective_bucket_width_caps_driver_table():
    from pawpaw_ray.stages.curation import _effective_bucket_width

    # small corpora keep the requested width
    assert _effective_bucket_width(0, 10_000, 4096, 65536) == 4096
    # 10^11-doc id range (the round-3 verdict's failure scenario): the
    # width widens so the bucket count — and with it the driver prefix
    # table and the broadcast offsets dict — stays <= max_buckets
    w = _effective_bucket_width(0, 10**11, 4096, 65536)
    assert (10**11 + 1 + w - 1) // w <= 65536
    # pathological requested width (1) is widened, never honored blindly
    w1 = _effective_bucket_width(0, 10**9, 1, 1000)
    assert (10**9 + 1 + w1 - 1) // w1 <= 1000


def test_token_pack_pathological_width_bounded_and_invariant(ray_session):
    import ray.data as rd

    # sparse ids across a wide range: bucket_width=1 would naively make
    # one bucket per id VALUE in range (10^6 driver rows for 40 docs);
    # max_buckets=16 forces the widened width, output must not change
    rng = np.random.RandomState(5)
    ids = np.sort(rng.choice(1_000_000, size=40, replace=False)).astype(np.int64)
    df = pd.DataFrame({
        "doc_id": ids,
        "text": [" ".join(f"w{j}" for j in range(rng.randint(1, 30)))
                 for _ in ids],
    })
    a = (token_pack(rd.from_pandas(df), budget=64, bucket_width=4096)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (token_pack(rd.from_pandas(df).repartition(5), budget=64,
                    bucket_width=1, max_buckets=16)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_token_pack_tokenizer_hook_parity(ray_session):
    """The actor-pool tokenizer path must reproduce the regex default when
    given an equivalent counter, and honor a genuinely different
    tokenizer (whitespace) elsewhere."""
    import regex as rx
    import ray.data as rd

    from pawpaw_ray.stages.textstats import TOKEN_PATTERN

    df = _pack_frame(120)

    def regex_equiv_factory():
        pat = rx.compile(TOKEN_PATTERN)
        return lambda texts: [len(pat.findall(t)) for t in texts]

    base = (token_pack(rd.from_pandas(df), budget=100)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    hooked = (token_pack(rd.from_pandas(df), budget=100,
                         tokenizer=regex_equiv_factory,
                         tokenizer_concurrency=2)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, hooked)

    ws = (token_pack(rd.from_pandas(df), budget=100,
                     tokenizer=lambda: (lambda ts: [len(t.split()) for t in ts]),
                     tokenizer_concurrency=2)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want_n = df["text"].str.split().str.len().to_numpy()
    assert (ws.sort_values("doc_id")["n_tokens"].to_numpy() == want_n).all()


def test_eval_shingle_set_distinct_aggregate_path(ray_session):
    """Forcing the in-cluster distinct aggregate (driver_merge_bytes=0)
    must yield the identical broadcast array as the driver-merge default."""
    import ray
    import ray.data as rd

    rng = np.random.RandomState(2)
    vocab = [f"w{i}" for i in range(20)]
    ev = pd.DataFrame({
        "doc_id": np.arange(12, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, size=rng.randint(8, 40)))
                 for _ in range(12)],
    })
    ds = rd.from_pandas(ev).repartition(4)
    a = ray.get(eval_shingle_set(ds))
    b = ray.get(eval_shingle_set(ds, driver_merge_bytes=0))
    assert np.array_equal(a, b)


def test_quota_sample_vs_sql(ray_session):
    """sqrt-quota source mixing == the DuckDB window expression: per-source
    quota floor(k*sqrt(n)), md5-rank selection, small sources kept whole."""
    import ray.data as rd

    from pawpaw_ray.stages.curation import quota_sample

    rng = np.random.RandomState(11)
    n = 1200
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        # skewed mix: one giant source, mid sources, one tiny (kept whole)
        "source": rng.choice(["web", "web", "web", "web", "news", "wiki",
                              "books"], size=n),
    })
    df.loc[:2, "source"] = "tiny"
    ds = rd.from_pandas(df).repartition(5)
    out = (quota_sample(ds, k_scale=8, strata_col="source")
           .to_pandas().sort_values(["source", "rk"]).reset_index(drop=True))

    exp = duckdb.sql("""
        WITH stats AS (SELECT source, count(*) n_docs FROM df GROUP BY source),
        quota AS (SELECT source,
                  CAST(floor(8 * sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) k
                  FROM stats),
        ranked AS (SELECT d.source, d.doc_id, q.k, row_number() OVER (
                     PARTITION BY d.source
                     ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) rk
                   FROM df d JOIN quota q USING (source))
        SELECT source, doc_id, CAST(rk AS BIGINT) rk FROM ranked
        WHERE rk <= k ORDER BY source, rk""").df()
    pd.testing.assert_frame_equal(out[["source", "doc_id", "rk"]], exp)

    # tiny source survives whole; the giant one is capped at 8*sqrt(n)
    assert (out["source"] == "tiny").sum() == 3
    n_web = int((df["source"] == "web").sum())
    assert (out["source"] == "web").sum() == int(np.floor(8 * np.sqrt(n_web)))


def test_quota_sample_precomputed_quotas(ray_session):
    """quotas= skips the count pass and pins the same selection."""
    import ray.data as rd

    from pawpaw_ray.stages.curation import quota_sample

    df = _sample_frame(300)
    ds = rd.from_pandas(df).repartition(3)
    auto = quota_sample(ds, k_scale=4, strata_col="lang").to_pandas()
    counts = df["lang"].value_counts()
    quotas = {s: int(np.floor(4 * np.sqrt(np.float64(n))))
              for s, n in counts.items()}
    pinned = quota_sample(ds, strata_col="lang", quotas=quotas).to_pandas()
    a = auto.sort_values(["lang", "rk"]).reset_index(drop=True)
    b = pinned.sort_values(["lang", "rk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_chunk_documents_differential(ray_session):
    """Overlapping chunk windows vs a per-doc brute force: short docs
    (one chunk), exact-boundary docs (no redundant tail window), long
    docs (several windows), whitespace-run and leading/trailing space
    handling, and the all-whitespace doc (zero chunks)."""
    import math

    import ray.data as rd

    from pawpaw_ray.stages.curation import chunk_documents

    rng = np.random.default_rng(41)
    texts = []
    for n in [1, 5, 10, 11, 34, 58, 59, 80, 200]:
        words = [f"w{rng.integers(0, 50)}" for _ in range(n)]
        texts.append("  " + " \t ".join(words) + "\n")
    texts.append("   \t\n  ")          # all-whitespace: zero chunks
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})

    size, stride = 10, 6
    got = (chunk_documents(rd.from_pandas(df), size=size, stride=stride)
           .to_pandas().sort_values(["doc_id", "chunk_idx"])
           .reset_index(drop=True))

    rows = []
    for _, r in df.iterrows():
        toks = r.text.split()
        if not toks:
            continue
        n = len(toks)
        n_chunks = 1 if n <= size else 1 + math.ceil((n - size) / stride)
        for k in range(n_chunks):
            win = toks[k * stride:k * stride + size]
            rows.append((r.doc_id, k, " ".join(win), len(win)))
    want = (pd.DataFrame(rows, columns=["doc_id", "chunk_idx",
                                        "chunk_text", "n_tokens"])
            .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))

    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # doc with 200 tokens has many windows; all-whitespace doc has none
    assert got[got.doc_id == 8].chunk_idx.max() > 2
    assert 9 not in set(got.doc_id)


def test_chunk_documents_rejects_bad_stride(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.curation import chunk_documents

    df = pd.DataFrame({"doc_id": [1], "text": ["a b c"]})
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(rd.from_pandas(df), size=4, stride=5)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(rd.from_pandas(df), size=4, stride=0)
