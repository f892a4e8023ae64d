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
Batches stay small (``batch_size=64``) because rows are megabyte-scale at
production — the knob that keeps batch x concurrency inside a worker heap.
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


def media_pipeline(media_ds, embed_dim: int = 16, max_side: int = 256,
                   every: int = 10, concurrency=(1, 4)):
    """decode (actor pool, small batches) → resize plan → frame sample."""
    return (media_ds
            .map_batches(MediaDecoder,
                         fn_constructor_kwargs={"embed_dim": embed_dim},
                         batch_format="pyarrow", batch_size=64,
                         concurrency=concurrency)
            .map_batches(lambda b: resize_plan_batch(b, max_side),
                         batch_format="pyarrow")
            .map_batches(lambda b: frame_sample_batch(b, every),
                         batch_format="pyarrow"))
