"""Near-dup variants (Jaccard-verified, SimHash, embedding-cosine),
LSH ANN, and the multimodal stub pipeline."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    import ray.data as rd

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest tonight")
    # filler docs must be genuinely dissimilar (J ~ 0): template docs
    # sharing a fixed 3-gram frame sit at J ~ 0.14 pairwise, where 4-row
    # LSH bands (bands=16 below) expect ~3 false-positive candidate pairs
    # among 435 under IDEAL minhash math — "singletons stay singletons"
    # is only a testable property of actually-unrelated docs
    rows = []
    for i in range(30):
        words = " ".join(f"w{i}q{j}z" for j in range(10))
        rows.append({"doc_id": i, "text": f"doc {i} {words}"})
    # near-dup group: 100..102 (small edits), exact dup pair 103/104
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base + " extra"})
    rows.append({"doc_id": 102, "text": base.replace("lazy", "sleepy")})
    rows.append({"doc_id": 103, "text": "identical twin text here"})
    rows.append({"doc_id": 104, "text": "identical twin text here"})
    return rd.from_pandas(pd.DataFrame(rows)).repartition(4)


def test_near_dup_jaccard(docs_with_dups):
    from pawpaw_ray.stages.dedup import near_dup_jaccard

    # bands=16 (4 rows/band): ~0.99 candidate recall at Jaccard 0.7
    out = near_dup_jaccard(docs_with_dups, threshold=0.5, bands=16)
    byid = dict(zip(out["doc_id"], out["cluster_id"]))
    assert byid[100] == byid[101] == byid[102] == 100
    assert byid[103] == byid[104] == 103
    assert byid[0] == 0 and byid[1] == 1  # uniques stay singleton


def test_simhash_clusters(docs_with_dups):
    from pawpaw_ray.stages.dedup import simhash_clusters

    out = simhash_clusters(docs_with_dups, max_hamming=6)
    byid = dict(zip(out["doc_id"], out["cluster_id"]))
    assert byid[103] == byid[104] == 103  # exact dups: hamming 0
    assert byid[100] == byid[101]         # one-word append: tiny hamming
    assert byid[0] != byid[1]


@pytest.fixture(scope="module")
def embeddings_ds(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(5)
    vecs = rng.standard_normal((50, 32))
    vecs[41] = vecs[40] + 0.01 * rng.standard_normal(32)  # near-dup pair
    vecs[42] = vecs[40] + 0.01 * rng.standard_normal(32)
    tbl = pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64())),
    })
    return rd.from_arrow(tbl).repartition(3)


def test_embedding_near_dup(embeddings_ds):
    from pawpaw_ray.stages.similarity import embedding_near_dup

    out = embedding_near_dup(embeddings_ds, threshold=0.95, n_bits=6)
    byid = dict(zip(out["vec_id"], out["cluster_id"]))
    assert byid[40] == byid[41] == byid[42] == 40
    singleton = [i for i in range(40) if byid[i] == i]
    assert len(singleton) >= 35  # random vectors rarely pass 0.95 cosine


def test_ann_topk_lsh_vs_bruteforce(embeddings_ds):
    from pawpaw_ray.stages.similarity import ann_topk, ann_topk_lsh

    exact = ann_topk(embeddings_ds, [40], k=5)
    approx = ann_topk_lsh(embeddings_ds, [40], k=5, n_bits=4, probe_radius=1)
    # the query's own bucket always contains itself + its near-dups
    got = set(approx["vec_id"])
    assert 40 in got and {41, 42} <= got
    # recall@5 gate vs the exact baseline (structured fixture: the planted
    # near-dups share the query's bucket; multi-probe covers the rest)
    recall = len(set(exact["vec_id"]) & got) / 5
    assert recall >= 0.8, recall
    assert list(approx.columns) == ["query_id", "vec_id", "sim", "rank",
                                    "lsh_code"]


def test_ann_topk_lsh_multiprobe_improves_recall(embeddings_ds):
    """Multi-probe (round-2 fix) must strictly dominate single-probe on the
    same code width: the Hamming-ball candidates are a superset."""
    from pawpaw_ray.stages.similarity import ann_topk, ann_topk_lsh

    exact = set(ann_topk(embeddings_ds, [7], k=10)["vec_id"])
    r0 = set(ann_topk_lsh(embeddings_ds, [7], k=10, n_bits=4,
                          probe_radius=0)["vec_id"])
    r2 = set(ann_topk_lsh(embeddings_ds, [7], k=10, n_bits=4,
                          probe_radius=2)["vec_id"])
    assert len(exact & r2) >= len(exact & r0)
    assert len(exact & r2) / 10 >= 0.8


def test_ann_topk_lsh_production_params_selective_and_high_recall(ray_session):
    """The driver configuration (16 bits / radius 2 / 4 tables) must scan
    ≤5% of a large table while keeping recall ≥0.9 on genuinely-near
    neighbors (cosine ≥0.9 planted pairs) — the 100 TB selectivity bar."""
    import ray.data as rd

    from pawpaw_ray.stages.similarity import (
        _hyperplanes_mt, _probe_codes, _signs_to_codes, ann_topk_lsh)

    rng = np.random.RandomState(9)
    n, dim = 5000, 64
    E = rng.standard_normal((n, dim))
    # plant 5 near neighbors of query 0 (cosine ~0.95+)
    planted = list(range(1, 6))
    for j in planted:
        E[j] = E[0] + 0.18 * rng.standard_normal(dim)
    tbl = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array([v.tolist() for v in E],
                                          pa.list_(pa.float64()))})
    ds = rd.from_arrow(tbl).repartition(4)

    n_bits, radius, n_tables = 16, 2, 4
    out = ann_topk_lsh(ds, [0], k=6, n_bits=n_bits, probe_radius=radius,
                       n_tables=n_tables)
    got = set(out["vec_id"])
    assert 0 in got
    recall = len(set(planted) & got) / len(planted)
    assert recall >= 0.9, recall

    # scan fraction: rebuild the (deterministic, seed-locked) probe masks
    # exactly as the fused scorer does and count candidate rows
    H = _hyperplanes_mt(n_bits, dim, n_tables)
    Q = E[[0]]
    cand = np.zeros(n, dtype=bool)
    for t in range(n_tables):
        codes = _signs_to_codes((E @ H[t].T) > 0)
        wanted = _probe_codes(_signs_to_codes((Q @ H[t].T) > 0),
                              n_bits, radius)
        cand |= np.isin(codes, wanted)
    frac = cand.mean()
    assert 0 < frac <= 0.05, frac


def test_media_pipeline(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.multimodal import (
        FakeCodec,
        ensure_media_parquet,
        media_pipeline,
        synthesize_media,
    )

    path = ensure_media_parquet(90)
    out = media_pipeline(rd.read_parquet(path)).to_pandas()
    assert len(out) == 90
    assert set(out.columns) == {"media_id", "kind", "width", "height",
                                "n_frames", "n_bytes", "embedding",
                                "target_w", "target_h", "sampled_frames"}
    # resize plan: aspect preserved, capped
    assert (out[["target_w", "target_h"]].max(axis=1) <= 256).all()
    # frame sampling only for videos
    vid = out[out["kind"] == "video"]
    img = out[out["kind"] == "image"]
    assert (vid["sampled_frames"].map(len) >= 1).all()
    assert (img["sampled_frames"].map(len) == 0).all()
    # deterministic: same seed → same embedding
    t = synthesize_media(5)
    e1 = FakeCodec().embed(t["payload"][0].as_py())
    e2 = FakeCodec().embed(t["payload"][0].as_py())
    assert np.array_equal(e1, e2) and len(e1) == 16

    # a non-synthetic payload must fail loudly (real codec is stubbed)
    with pytest.raises(NotImplementedError):
        FakeCodec().decode_meta(b"JPEG\x00\x00\x00\x00\x00\x00rubbish")


def test_payload_batch_size_byte_aware(ray_session):
    import ray.data as rd

    from pawpaw_ray.stages.multimodal import (
        _avg_payload_bytes,
        ensure_media_parquet,
        payload_batch_size,
        synthesize_media,
    )

    # MB-scale production rows -> small batches; KB rows -> large batches
    assert payload_batch_size(1 << 20) == 16   # 1 MB rows floor at lo
    assert payload_batch_size(128 << 10) == 64
    assert payload_batch_size(1 << 10) == 4096  # 1 KB rows cap at hi
    assert payload_batch_size(0) == 4096

    # metadata sniff matches the true mean within parquet-stats slack,
    # without executing the dataset
    path = ensure_media_parquet(300)
    avg = _avg_payload_bytes(rd.read_parquet(path))
    t = synthesize_media(300)
    true_avg = sum(len(p.as_py()) for p in t["payload"]) / 300
    assert avg is not None and abs(avg - true_avg) / true_avg < 0.10

    # non-file-backed input falls back to None (pipeline uses default)
    assert _avg_payload_bytes(rd.from_arrow(t.select(["payload"]))) is None


def test_ann_topk_ivf_vs_bruteforce(embeddings_ds):
    from pawpaw_ray.stages.similarity import ann_topk, ann_topk_ivf

    exact = ann_topk(embeddings_ds, [40], k=5)
    approx = ann_topk_ivf(embeddings_ds, [40], k=5, n_lists=8, n_probe=2)
    got = set(approx["vec_id"])
    # the query's own list always contains itself; its planted near-dups
    # land in the same list (cosine ~1 -> same nearest centroid)
    assert 40 in got and {41, 42} <= got
    recall = len(set(exact["vec_id"]) & got) / 5
    assert recall >= 0.8, recall
    assert list(approx.columns) == ["query_id", "vec_id", "sim", "rank",
                                    "ivf_list"]


def test_ann_topk_ivf_selective_and_high_recall(ray_session):
    """Driver configuration (64 lists / 4 probes) must scan a bounded
    fraction of a large table while keeping recall >=0.9 on genuinely-near
    planted neighbors — the coarse-quantizer selectivity bar."""
    import ray.data as rd

    from pawpaw_ray.stages.similarity import (
        _kmeans_lite, _normalize, ann_topk, ann_topk_ivf)
    from pawpaw_ray.stages.dedup import _splitmix64

    rng = np.random.RandomState(9)
    n, dim = 5000, 64
    E = rng.standard_normal((n, dim))
    planted = list(range(1, 6))
    for j in planted:
        E[j] = E[0] + 0.18 * rng.standard_normal(dim)
    tbl = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array([v.tolist() for v in E],
                                          pa.list_(pa.float64()))})
    ds = rd.from_arrow(tbl).repartition(4)

    out = ann_topk_ivf(ds, [0], k=6, n_lists=64, n_probe=4)
    got = set(out["vec_id"])
    assert 0 in got
    recall = len(set(planted) & got) / len(planted)
    assert recall >= 0.9, recall

    # scan fraction: rebuild the (deterministic) centroids exactly as the
    # operator does and count rows in the probed lists
    ids = np.arange(n, dtype=np.int64)
    mod = max(1, n // 10_000)
    sample = np.flatnonzero(_splitmix64(ids.view(np.uint64))
                            % np.uint64(mod) == 0)
    M = _normalize(E)
    C = _kmeans_lite(M[sample], 64)
    probes = np.argpartition(-(M[[0]] @ C.T), 3, axis=1)[:, :4]
    frac = np.isin(np.argmax(M @ C.T, axis=1), np.unique(probes)).mean()
    assert 0 < frac <= 0.15, frac

    # block-order invariance: a different partitioning yields identical rows
    out2 = ann_topk_ivf(ds.repartition(11), [0], k=6, n_lists=64, n_probe=4)
    assert out[["query_id", "vec_id", "rank"]].equals(
        out2[["query_id", "vec_id", "rank"]])


def test_cosine_bucket_pairs_skew_capped():
    """≥10k near-identical vectors in ONE code bucket (the duplicate-skew
    scenario from the round-3 verdict): the pairing kernel must cap the
    emitted pairs and the similarity matrix via the multi-hub fallback,
    keep the group fully connected, and count the capped-recall event."""
    from pawpaw_ray.stages.dedup import CAPPED_BUCKET_EVENTS
    from pawpaw_ray.stages.similarity import _cosine_bucket_pairs

    rng = np.random.RandomState(3)
    n, cap = 10_000, 512
    vecs = (rng.standard_normal(16)
            + 1e-4 * rng.standard_normal((n, 16)))
    g = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "lsh_table": np.zeros(n, dtype=np.int32),
        "lsh_code": np.zeros(n, dtype=np.uint64),
        "embedding": list(vecs),
    })
    before = CAPPED_BUCKET_EVENTS.get("embedding_near_dup", 0)
    out = _cosine_bucket_pairs(g, threshold=0.95, max_all_pairs=cap,
                               chunk=1024)
    assert CAPPED_BUCKET_EVENTS.get("embedding_near_dup", 0) == before + 1
    # pair budget: h*n <= cap^2/2 — never the n^2/2 all-pairs blowup
    assert 0 < len(out) <= cap * cap // 2

    # every member connects to a hub -> a single component survives
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(out["a"].to_numpy(), out["b"].to_numpy()):
        parent[find(int(a))] = find(int(b))
    assert len({find(i) for i in range(n)}) == 1


def test_embedding_near_dup_input_lineage_executes_once(ray_session):
    """Computed inputs must not be re-executed by size-gate sniffs or the
    singleton-id scan (round-3 verdict item 3): the operator's only pass
    over the input lineage is the signing map."""
    import ray
    import ray.data as rd

    from pawpaw_ray.stages.similarity import embedding_near_dup

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def inc(self):
            self.n += 1

        def get(self):
            return self.n

    rng = np.random.RandomState(1)
    vecs = rng.standard_normal((60, 8))
    tbl = pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64())),
    })

    def make_ds(counter):
        def counting(b: pa.Table) -> pa.Table:
            ray.get(counter.inc.remote())
            return b
        return (rd.from_arrow(tbl).repartition(4)
                .map_batches(counting, batch_format="pyarrow"))

    # calibrate: batch-fn invocations for exactly ONE full pass
    c1 = Counter.remote()
    make_ds(c1).map_batches(lambda b: b, batch_format="pyarrow").count()
    n_single = ray.get(c1.get.remote())

    c2 = Counter.remote()
    out = embedding_near_dup(make_ds(c2), threshold=0.95, n_bits=6)
    assert len(out) == 60
    assert ray.get(c2.get.remote()) == n_single


def test_dedup_keep_best(docs_with_dups):
    """Representative selection: longest member wins, ties fall to min id,
    singletons keep themselves; one row per cluster."""
    import pyarrow.compute as pc

    from pawpaw_ray.stages.dedup import dedup_keep_best

    docs = docs_with_dups.map_batches(
        lambda b: b.append_column(
            "n_chars", pc.cast(pc.utf8_length(b["text"]), pa.int64())),
        batch_format="pyarrow")
    out = dedup_keep_best(docs, bands=16).to_pandas()
    by_cluster = out.set_index("cluster_id")

    # near-dup group 100/101/102: 101 = base + " extra" is the longest
    assert by_cluster.loc[100, "keep_id"] == 101
    assert by_cluster.loc[100, "n_members"] == 3
    # exact-dup pair 103/104: equal length -> tie breaks to min id
    assert by_cluster.loc[103, "keep_id"] == 103
    assert by_cluster.loc[103, "n_members"] == 2
    # singletons keep themselves; one row per cluster, every doc counted
    assert by_cluster.loc[0, "keep_id"] == 0
    assert int(out["n_members"].sum()) == docs_with_dups.count()
    assert out["cluster_id"].is_unique
