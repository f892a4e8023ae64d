"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Design per SURVEY.md §1.5 / the training-data operator set: image/audio/
video travel as ``binary`` columns; decode / feature-extract / resize /
frame-sample are ACTOR-POOL ``map_batches`` stages (decoder state built
once per actor in ``__init__``).  The imaging/audio libraries are not in
this container, so the decode kernel is a clearly-marked deterministic
fake over a self-describing synthetic format — the Ray-side plumbing
(schema, batch sizing, actor signature, output layout) is real and tested:

    header  = kind(4s: FIMG|FAUD|FVID) + width:u16 + height:u16 + frames:u16
    payload = seeded pseudo-random bytes

Swapping ``FakeCodec`` for a real PIL/ffmpeg codec changes ONE class.
Decode batches are BYTE-sized (``payload_batch_size``: ~8 MB of payload per
batch, sniffed from parquet column statistics) — megabyte-scale production
rows get small batches so batch x concurrency fits a worker heap, while
small-row fixtures aren't throttled to 150x the necessary dispatch count.
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),
    ("payload", pa.binary()),
])

_KINDS = ["image", "audio", "video"]
_MAGIC = {"image": b"FIMG", "audio": b"FAUD", "video": b"FVID"}
_MAGIC_REV = {v: k for k, v in _MAGIC.items()}


def synthesize_media(n: int, seed: int = 23) -> pa.Table:
    """Deterministic fake media table (no wall-clock, no randomness beyond
    the seed) — stands in for an object-store scan of real blobs."""
    rng = np.random.RandomState(seed)
    ids, kinds, payloads = [], [], []
    for i in range(n):
        kind = _KINDS[i % 3]
        w, h = int(rng.randint(16, 512)), int(rng.randint(16, 512))
        frames = int(rng.randint(1, 120)) if kind == "video" else 1
        body = rng.bytes(int(rng.randint(64, 2048)))
        header = _MAGIC[kind] + struct.pack("<HHH", w, h, frames)
        ids.append(i)
        kinds.append(kind)
        payloads.append(header + body)
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "kind": pa.array(kinds, pa.string()),
                     "payload": pa.array(payloads, pa.binary())},
                    schema=MEDIA_SCHEMA)


def ensure_media_parquet(n: int, seed: int = 23) -> str:
    import pyarrow.parquet as pq
    path = f"/tmp/pawpaw_ray_data/media_{n}_{seed}.parquet"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(synthesize_media(n, seed), path)
    return path


class FakeCodec:
    """Deterministic stand-in decoder.  A real implementation would parse
    image bytes here (PIL / libav); the container has neither, so anything
    but the fake format raises — loudly, not silently."""

    def decode_meta(self, payload: bytes) -> dict:
        kind = _MAGIC_REV.get(payload[:4])
        if kind is None:
            raise NotImplementedError(
                "real media decoding is STUBBED in this environment; "
                "payload is not the synthetic FIMG/FAUD/FVID format")
        w, h, frames = struct.unpack("<HHH", payload[4:10])
        return {"kind": kind, "width": w, "height": h, "n_frames": frames,
                "n_bytes": len(payload)}

    def embed(self, payload: bytes, dim: int = 16) -> np.ndarray:
        """Deterministic pseudo-embedding from the payload digest."""
        digest = hashlib.blake2b(payload, digest_size=dim * 2).digest()
        raw = np.frombuffer(digest, dtype=np.uint16).astype(np.float64)
        return (raw / 65535.0) * 2 - 1


class MediaDecoder:
    """Actor-pool stage: decode metadata + feature-extract.

    ``__init__`` constructs the codec ONCE per actor (for a real codec:
    model load / library init); ``__call__`` handles one batch."""

    def __init__(self, embed_dim: int = 16):
        self.codec = FakeCodec()
        self.embed_dim = embed_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        metas = [self.codec.decode_meta(p) for p in payloads]
        embs = [self.codec.embed(p, self.embed_dim) for p in payloads]
        t = batch.drop_columns(["payload"])  # features out, blobs dropped
        t = t.append_column("width", pa.array([m["width"] for m in metas], pa.int32()))
        t = t.append_column("height", pa.array([m["height"] for m in metas], pa.int32()))
        t = t.append_column("n_frames", pa.array([m["n_frames"] for m in metas], pa.int32()))
        t = t.append_column("n_bytes", pa.array([m["n_bytes"] for m in metas], pa.int64()))
        t = t.append_column("embedding", pa.array(
            [e.tolist() for e in embs], pa.list_(pa.float64())))
        return t


def resize_plan_batch(batch: pa.Table, max_side: int = 256) -> pa.Table:
    """Resize stage plumbing: computes target dims (aspect-preserving,
    capped at ``max_side``); the pixel transform itself is the stubbed
    codec step."""
    w = batch["width"].to_numpy()
    h = batch["height"].to_numpy()
    scale = np.minimum(1.0, max_side / np.maximum(w, h))
    return (batch
            .append_column("target_w", pa.array(
                np.maximum(1, np.rint(w * scale)).astype(np.int32)))
            .append_column("target_h", pa.array(
                np.maximum(1, np.rint(h * scale)).astype(np.int32))))


def frame_sample_batch(batch: pa.Table, every: int = 10) -> pa.Table:
    """Frame-sampling stage plumbing for video rows: emits the sampled
    frame-index list (bounded size per row)."""
    frames = batch["n_frames"].to_numpy()
    kinds = batch["kind"].to_pylist()
    samples = [list(range(0, int(f), every)) if k == "video" else []
               for f, k in zip(frames, kinds)]
    return batch.append_column(
        "sampled_frames", pa.array(samples, pa.list_(pa.int32())))


def payload_batch_size(avg_payload_bytes: float, target_bytes: int = 8 << 20,
                       lo: int = 16, hi: int = 4096) -> int:
    """Byte-aware decode batch size: target ~8 MB of payload per batch so
    batch x concurrency stays inside a worker heap regardless of row scale
    — MB-scale production blobs get small batches (a 1 MB row → 16/batch),
    KB-scale rows get large ones instead of paying per-batch dispatch 150x
    over (measured: 64-row batches on 1 KB rows ran ~15% slower end-to-end
    than byte-sized batches, plus a 2 s autoscaling-pool ramp)."""
    return int(min(hi, max(lo, target_bytes // max(1, int(avg_payload_bytes)))))


def _avg_payload_bytes(ds) -> float | None:
    """Parquet-metadata sniff of mean payload bytes/row — column statistics
    only, no dataset execution.  None when the input isn't file-backed."""
    try:
        files = ds.input_files()
    except Exception:
        return None
    if not files:
        return None
    import pyarrow.parquet as pq
    tot_bytes = tot_rows = 0
    for f in files[:4]:  # a few files bound the sniff on huge inputs
        try:
            md = pq.ParquetFile(f.split("://")[-1]).metadata
        except Exception:
            return None
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            for ci in range(grp.num_columns):
                col = grp.column(ci)
                if col.path_in_schema == "payload":
                    tot_bytes += col.total_uncompressed_size
            tot_rows += grp.num_rows
    return (tot_bytes / tot_rows) if tot_rows else None


def decode_pool_size(ncpu: int | None = None) -> int:
    """Fixed decode-pool size derived from the cluster: a FIXED pool starts
    all actors in parallel at stage start; the autoscaling ``(1, n)`` ramp
    serialized codec spin-up and cost ~2 s on a 10k-row fixture."""
    import ray
    if ncpu is None:
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            ncpu = 8
    return max(2, min(16, ncpu // 8))


def media_pipeline(media_ds, embed_dim: int = 16, max_side: int = 256,
                   every: int = 10, concurrency=None, batch_size=None):
    """decode (fixed actor pool, byte-sized batches) → resize plan →
    frame sample."""
    if batch_size is None:
        avg = _avg_payload_bytes(media_ds)
        batch_size = payload_batch_size(avg) if avg else 64
    if concurrency is None:
        concurrency = decode_pool_size()
    return (media_ds
            .map_batches(MediaDecoder,
                         fn_constructor_kwargs={"embed_dim": embed_dim},
                         batch_format="pyarrow", batch_size=batch_size,
                         concurrency=concurrency)
            .map_batches(lambda b: resize_plan_batch(b, max_side),
                         batch_format="pyarrow")
            .map_batches(lambda b: frame_sample_batch(b, every),
                         batch_format="pyarrow"))
