"""Distributed connected components + round-2 dedup fixes.

cc_labels (star-contraction rounds, stages/cc.py) is differentially tested
against a driver-side union-find on random graphs; the near_dup_jaccard
all-pairs fix is pinned by the bucket counterexample from the round-1
verdict (star-only pairing loses b~c whenever the bucket min fails
verification)."""

import numpy as np
import pandas as pd
import pytest


def _union_find_labels(pairs, ids):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(int(i)) for i in ids}


@pytest.mark.parametrize("small_gate", [2_000_000, 0],
                         ids=["unionfind-task", "star-rounds"])
@pytest.mark.parametrize("seed,n_nodes,n_edges", [
    (0, 30, 10), (1, 50, 60), (2, 200, 150), (3, 8, 0), (4, 40, 39),
])
def test_cc_labels_matches_union_find(ray_session, seed, n_nodes, n_edges,
                                      small_gate):
    """Both execution paths (size-gated one-task union-find and the
    large/small-star rounds) must match the driver union-find oracle."""
    import ray.data as rd

    from pawpaw_ray.stages.cc import cc_labels_pandas

    rng = np.random.RandomState(seed)
    ids = np.arange(n_nodes, dtype=np.int64) * 3 + 1  # non-contiguous ids
    a = rng.choice(ids, size=n_edges)
    b = rng.choice(ids, size=n_edges)
    keep = a != b
    pairs = pd.DataFrame({"a": a[keep], "b": b[keep]})

    got = cc_labels_pandas(
        rd.from_pandas(pairs), rd.from_pandas(pd.DataFrame({"doc_id": ids})),
        small_graph_edges=small_gate)
    want = _union_find_labels(zip(pairs["a"], pairs["b"]), ids)
    assert dict(zip(got["doc_id"], got["cluster_id"])) == want
    assert len(got) == n_nodes


@pytest.mark.parametrize("small_gate", [2_000_000, 0],
                         ids=["unionfind-task", "star-rounds"])
def test_cc_long_chain(ray_session, small_gate):
    """A path graph needs multiple contraction rounds — exercises the
    convergence loop, not just the one-round star case."""
    import ray.data as rd

    from pawpaw_ray.stages.cc import cc_labels_pandas

    n = 64
    pairs = pd.DataFrame({"a": np.arange(n - 1, dtype=np.int64),
                          "b": np.arange(1, n, dtype=np.int64)})
    ids = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    got = cc_labels_pandas(rd.from_pandas(pairs), rd.from_pandas(ids),
                           small_graph_edges=small_gate)
    assert (got["cluster_id"] == 0).all()


def test_pairs_from_bucket_all_pairs():
    from pawpaw_ray.stages.dedup import _pairs_from_bucket

    g = pd.DataFrame({"doc_id": [3, 1, 2, 1]})
    star = _pairs_from_bucket(g)
    assert set(zip(star["a"], star["b"])) == {(1, 2), (1, 3)}
    full = _pairs_from_bucket(g, all_pairs=True)
    assert set(zip(full["a"], full["b"])) == {(1, 2), (1, 3), (2, 3)}
    # cap falls back to star pairs
    capped = _pairs_from_bucket(g, all_pairs=True, max_all_pairs=2)
    assert set(zip(capped["a"], capped["b"])) == {(1, 2), (1, 3)}


def test_near_dup_jaccard_verified_edge_not_pruned(ray_session):
    """Round-1 verdict counterexample: bucket {a,b,c} where a fails
    verification against both b and c, but b~c is genuine.  Star-only
    pairing would never test (b, c) and wrongly split them."""
    import ray.data as rd

    from pawpaw_ray.stages.dedup import (
        MinHashLSH,
        jaccard,
        minhash_signature,
        near_dup_jaccard,
        shingles,
    )

    b_text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
              "lambda mu nu xi omicron pi rho sigma tau upsilon")
    c_text = b_text + " phi chi"          # J(b, c) well above 0.5
    assert jaccard(b_text, c_text) >= 0.5

    # deterministically search for a text sharing a band with b (same LSH
    # params as the operator) while staying below the Jaccard threshold
    lsh = MinHashLSH(num_perm=64, bands=16)

    def bands(text):
        import hashlib
        sig = minhash_signature(text, lsh.seeds, lsh.k)
        return {hashlib.sha1(
            sig[i * 4:(i + 1) * 4].tobytes() + bytes([i])).hexdigest()[:16]
            for i in range(16)}

    b_bands = bands(b_text)
    words = b_text.split()
    a_text = None
    for i in range(2000):
        # replace a sliding 6-word block of b with noise: J ~ 0.38-0.44,
        # colliding on some band for many (offset, noise) combinations
        off = i % 15
        cand = " ".join(words[:off] + [f"n{i}x{j}" for j in range(6)]
                        + words[off + 6:])
        if jaccard(cand, b_text) < 0.5 and jaccard(cand, c_text) < 0.5 \
                and bands(cand) & b_bands:
            a_text = cand
            break
    assert a_text is not None, "no colliding low-Jaccard text found"

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [a_text, b_text, c_text]}))
    out = near_dup_jaccard(docs, threshold=0.5, bands=16)
    byid = dict(zip(out["doc_id"], out["cluster_id"]))
    assert byid[2] == byid[3] == 2, byid   # b~c survives a's false positive
    assert byid[1] == 1                    # a stays singleton


def test_simhash_vectorized_matches_reference_loop():
    """The vectorized simhash64 must be bit-identical to the obvious
    per-token loop (the round-1 implementation)."""
    import hashlib

    from pawpaw_ray.stages.dedup import _norm_tokens, simhash64

    def slow(text):
        toks = _norm_tokens(text)
        if not toks:
            return 0
        acc = [0] * 64
        for t in toks:
            h = int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
            for i in range(64):
                acc[i] += 1 if (h >> i) & 1 else -1
        return sum(1 << i for i in range(64) if acc[i] > 0)

    for text in ["", "one", "the quick brown fox", "a a a b b c",
                 "Unicode ÆØÅ tokens 123 _under_score_ mixed CASE case"]:
        assert simhash64(text) == slow(text), text


def test_minhash_match_rate_tracks_jaccard():
    """The per-permutation minhash match rate must track true Jaccard (the
    round-1 modular family was piecewise-monotone in the shingle hash and
    measured ~0.12 at J=0.29)."""
    from pawpaw_ray.stages.dedup import _minhash_params, jaccard, minhash_signature

    (seeds,) = _minhash_params(2048)
    base = " ".join(f"tok{i}" for i in range(40))
    other = " ".join(f"tok{i}" for i in range(20)) + " " + \
        " ".join(f"alt{i}" for i in range(20))
    J = jaccard(base, other)
    sa = minhash_signature(base, seeds)
    sb = minhash_signature(other, seeds)
    rate = float((sa == sb).mean())
    assert abs(rate - J) < 0.05, (rate, J)


def test_exact_dedup_keys_only_shuffle(ray_session):
    """exact_dedup output parity after the keys-only rewrite, and the keyed
    batch must not carry the text column into the shuffle."""
    import pyarrow as pa
    import ray.data as rd

    from pawpaw_ray.stages.dedup import exact_dedup, exact_key_batch

    df = pd.DataFrame({
        "doc_id": [5, 1, 2, 3, 4],
        "text": ["x", "dup", "dup", "y", "dup"]})
    keyed = exact_key_batch(pa.Table.from_pandas(df))
    assert set(keyed.column_names) == {"text_sha1", "doc_id"}

    out = exact_dedup(rd.from_pandas(df).repartition(3)).to_pandas()
    got = dict(zip(out["doc_id"], out["n_copies"]))
    assert got == {1: 3, 3: 1, 5: 1}


def test_pairs_from_bucket_multihub_fallback():
    """Oversized verified buckets fall back to multi-hub stars: bounded by
    the all-pairs cost at the threshold, and a single bad hub no longer
    disconnects the remainder (round-2 review finding)."""
    from pawpaw_ray.stages.dedup import _pairs_from_bucket

    n, cap = 40, 8  # n > max_all_pairs triggers the fallback
    g = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    out = _pairs_from_bucket(g, all_pairs=True, max_all_pairs=cap)
    # single hub at this cap: the min id pairs with every member
    pairs = set(zip(out["a"], out["b"]))
    assert pairs == {(0, b) for b in range(1, n)}
    # cost bound: never more pairs than threshold all-pairs
    assert len(out) <= cap * (cap - 1) // 2 + n
    # with a larger cap, multiple hubs appear, SPREAD across the id range
    out2 = _pairs_from_bucket(g, all_pairs=True, max_all_pairs=20)
    hubs2 = 20 * 20 // (2 * n)
    assert hubs2 == 5
    touched = set(out2["a"]) | set(out2["b"])
    hub_ids = {h for h in range(n)
               if len(out2[(out2["a"] == h) | (out2["b"] == h)]) >= n - hubs2}
    assert len(hub_ids) == hubs2
    # hubs span the range (first and last ids included), not the smallest h
    assert 0 in hub_ids and n - 1 in hub_ids
    assert max(hub_ids) - min(hub_ids) == n - 1
    # every member pairs with every hub (a<b normalized), no duplicates
    for h in hub_ids:
        partners = set(out2[out2["a"] == h]["b"]) | set(out2[out2["b"] == h]["a"])
        assert partners == set(range(n)) - {h}
    assert touched == set(range(n))
    assert not out2.duplicated(["a", "b"]).any()
    assert (out2["a"] < out2["b"]).all()
    # cost bound holds for the multi-hub case too
    assert len(out2) <= 20 * 19 // 2 + hubs2 * n
    # unverified path unchanged: single star
    star = _pairs_from_bucket(g, all_pairs=False, max_all_pairs=cap)
    assert set(star["a"]) == {0} and len(star) == n - 1


def test_lsh_pairs_both_paths_agree(ray_session):
    """The size-gated one-task pair generation and the distributed
    bucketed-groupby path must emit the same pair set."""
    import ray.data as rd

    from pawpaw_ray.stages.dedup import _lsh_pairs

    texts = [f"alpha beta gamma delta epsilon zeta eta theta doc{i % 7}"
             for i in range(40)]
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(40, dtype=np.int64), "text": texts}))

    def pairset(**kw):
        df = _lsh_pairs(docs, 64, 8, 3, "doc_id", "text", **kw).to_pandas()
        return set(zip(df["a"], df["b"]))

    for all_pairs in (False, True):
        small = pairset(all_pairs=all_pairs, distinct=True,
                        small_band_rows=10**9)
        dist = pairset(all_pairs=all_pairs, distinct=True, small_band_rows=0)
        assert small == dist and len(small) > 10, all_pairs


def test_simhash_clusters_distributed_path(ray_session, monkeypatch):
    """simhash_clusters with the size gate disabled (distributed bucketed
    groupby) matches the one-task path."""
    import ray.data as rd

    import pawpaw_ray.stages.dedup as dd

    texts = ([f"common words shared by near dups variant{i % 3}"
              for i in range(12)] + ["totally different content here"])
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(13, dtype=np.int64), "text": texts}))
    small = dd.simhash_clusters(docs, max_hamming=3)
    monkeypatch.setattr(dd, "SMALL_BAND_ROWS", 0)
    dist = dd.simhash_clusters(docs, max_hamming=3)
    assert small.equals(dist) and small["cluster_id"].nunique() < 13


def test_near_dup_verify_paths_agree(ray_session):
    """Broadcast-dict and hash-join verification must produce identical
    clusters (the join path is the driverless 100 TB route)."""
    import ray.data as rd

    from pawpaw_ray.stages.dedup import near_dup_jaccard

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    texts = [base, base + " phi", base + " chi psi",
             "completely different text about other things entirely one",
             "completely different text about other things entirely two"]
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(5, dtype=np.int64), "text": texts}))
    via_broadcast = near_dup_jaccard(docs, threshold=0.5, bands=16,
                                     broadcast_cand_docs=10**9)
    via_join = near_dup_jaccard(docs, threshold=0.5, bands=16,
                                broadcast_cand_docs=0)
    assert via_broadcast.equals(via_join)
    byid = dict(zip(via_broadcast["doc_id"], via_broadcast["cluster_id"]))
    assert byid[0] == byid[1] == byid[2] == 0   # near-dups cluster
    assert byid[3] == byid[4]                   # the other near-dup pair


def test_simhash_batch_matches_per_doc():
    """simhash64_many (batch-level vocab hashing) is bit-identical to the
    per-doc kernel, including empty and repeated-token docs."""
    from pawpaw_ray.stages.dedup import simhash64, simhash64_many

    texts = ["", "one", "the quick brown fox", "a a a b b c",
             "shared vocab the quick fox", "Unicode ÆØÅ 123 _x_ CASE case"]
    got = simhash64_many(texts)
    for t, g in zip(texts, got):
        assert int(g) == simhash64(t), t


def test_hamming_matrix_matches_scalar():
    """Vectorized XOR-popcount matrix is exact vs the scalar kernel."""
    from pawpaw_ray.stages.dedup import _hamming_matrix, hamming64

    rng = np.random.RandomState(3)
    sa = rng.randint(0, 2**63, size=17, dtype=np.int64).astype(np.uint64)
    sb = rng.randint(0, 2**63, size=11, dtype=np.int64).astype(np.uint64)
    d = _hamming_matrix(sa, sb)
    for i in range(len(sa)):
        for j in range(len(sb)):
            assert d[i, j] == hamming64(int(sa[i]), int(sb[j]))


def test_simhash_clusters_skewed_bucket_bounded(ray_session, monkeypatch):
    """10k identical docs land every signature in ONE band bucket; the
    multi-hub cap keeps pair emission (and wall time) bounded instead of
    n^2/2 comparisons, and the cluster is still connected."""
    import ray.data as rd

    import pawpaw_ray.stages.dedup as dd

    n = 10_000
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["the very same duplicated document text"] * n,
    })).repartition(4)
    monkeypatch.setattr(dd, "SMALL_BAND_ROWS", 0)  # force bucketed path
    out = dd.simhash_clusters(docs, max_hamming=3)
    assert len(out) == n
    assert out["cluster_id"].nunique() == 1 and out["cluster_id"].iloc[0] == 0


def test_near_dup_jaccard_byte_gate(ray_session):
    """Long documents trip the byte leg of the broadcast gate (count alone
    looks safe) and route to the join path — output pinned identical."""
    import ray.data as rd

    from pawpaw_ray.stages.dedup import near_dup_jaccard

    base = " ".join(f"token{i % 97} word{i % 53}" for i in range(400))
    texts = [base, base + " tail", "something else entirely different here",
             "another unrelated document with its own words"]
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(4, dtype=np.int64), "text": texts}))
    via_broadcast = near_dup_jaccard(docs, threshold=0.5, bands=16)
    via_join = near_dup_jaccard(docs, threshold=0.5, bands=16,
                                broadcast_cand_bytes=1)
    assert via_broadcast.equals(via_join)
    byid = dict(zip(via_join["doc_id"], via_join["cluster_id"]))
    assert byid[0] == byid[1] == 0 and byid[2] != byid[3]


def test_cc_nonconvergence_raises(ray_session):
    """Exhausting max_rounds without a fixed point is an error, not
    silently wrong labels."""
    import ray.data as rd

    from pawpaw_ray.stages.cc import cc_labels

    pairs = rd.from_pandas(pd.DataFrame(
        {"a": np.arange(0, 9, dtype=np.int64),
         "b": np.arange(1, 10, dtype=np.int64)}))
    ids = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64)}))
    with pytest.raises(RuntimeError, match="did not converge"):
        cc_labels(pairs, ids, small_graph_edges=0, max_rounds=0).to_pandas()


def test_similarity_empty_batch_guards():
    """MultiTableSigner and _LshProbeScorer short-circuit empty blocks
    (an empty FIRST batch must not crash or poison lazy plane derivation)."""
    import pyarrow as pa

    from pawpaw_ray.stages.similarity import MultiTableSigner, _LshProbeScorer
    import numpy as np

    empty = pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64())),
    })
    signer = MultiTableSigner(n_bits=4, n_tables=2)
    out = signer(empty)
    assert len(out) == 0 and signer.H is None
    full = pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                              pa.list_(pa.float64())),
    })
    assert len(signer(full)) == 4  # still works after the empty block

    state = {"H": np.eye(2), "wanted": np.array([0], dtype=np.uint64),
             "ids": [1], "matrix": np.array([[1.0, 0.0]])}
    scorer = _LshProbeScorer(state, k=1, id_col="vec_id", vec_col="embedding")
    assert len(scorer(empty)) == 0


def test_verify_pairs_join_sparse_partitions(ray_session, monkeypatch):
    """Canary for the Ray 2.49 hash-join empty-partition workaround in
    dedup._verify_pairs_join: with num_partitions >> pairs most partitions
    receive zero pair shards — the rename()/empty_table defense plus the
    sentinel rows must keep the join alive and the output exact."""
    import ray.data as rd

    from pawpaw_ray import tuning
    from pawpaw_ray.stages.dedup import _verify_pairs_join

    monkeypatch.setattr(tuning, "join_partitions", lambda: 16)

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["alpha beta gamma delta", "alpha beta gamma delta",
                 "totally different words here", "alpha beta gamma echo",
                 "unrelated content again", "alpha beta gamma delta"],
    })
    pairs = pd.DataFrame({"a": np.array([0, 0], dtype=np.int64),
                          "b": np.array([1, 5], dtype=np.int64)})
    out = _verify_pairs_join(rd.from_pandas(pairs), rd.from_pandas(docs),
                             threshold=0.9, k=3, id_col="doc_id",
                             text_col="text").to_pandas()
    got = set(zip(out["a"].astype(int), out["b"].astype(int)))
    assert got == {(0, 1), (0, 5)}
    assert (out["jaccard"] == 1.0).all()


def test_simhash_band_pairs_capped_counter():
    """Capped-recall events in the simhash pairing must be observable
    (round-3 ADVICE): counter bumps, pair budget holds, the near-identical
    group stays connected through the spread hubs."""
    from pawpaw_ray.stages.dedup import (CAPPED_BUCKET_EVENTS,
                                         _simhash_band_pairs)

    n, cap = 2000, 64
    rng = np.random.RandomState(4)
    base = np.uint64(0xDEADBEEFCAFED00D)
    # near-identical signatures: flip at most 1 low bit
    sigs = base ^ rng.randint(0, 2, size=n).astype(np.uint64)
    g = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                      "simhash64": sigs})
    before = CAPPED_BUCKET_EVENTS.get("simhash", 0)
    out = _simhash_band_pairs(g, max_hamming=3, max_all_pairs=cap)
    assert CAPPED_BUCKET_EVENTS.get("simhash", 0) == before + 1
    assert 0 < len(out) <= cap * cap // 2

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in zip(out["a"].to_numpy(), out["b"].to_numpy()):
        parent[find(int(a))] = find(int(b))
    assert len({find(i) for i in range(n)}) == 1
