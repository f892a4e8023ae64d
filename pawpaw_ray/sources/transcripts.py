"""Transcript table reader (the engine's source layer).

The reference has no reader layer (demos ``open(...).read()``,
``/root/reference/docs/demos/us_constitution/us_constitution.py:58-60``);
ours is ``ray.data.read_parquet`` with explicit column pruning — a stage that
reads all columns for a 3-column transform is wrong at 100 TB.
"""

from __future__ import annotations

import glob
import os

import ray.data as rd

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
# the segmentation/extraction path needs only these
PIPELINE_COLUMNS = ["conv_id", "turn_idx", "text"]


def transcript_files(path: str) -> list[str]:
    """Resolve a transcripts location (file, dir of parquet, or fixture dir
    containing ``transcripts/``) to a sorted file list — the shard unit of
    the resumable runner."""
    if os.path.isdir(os.path.join(path, "transcripts")):
        path = os.path.join(path, "transcripts")
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    return files


def read_transcripts(path: str | list[str], columns: list[str] | None = None,
                     **kwargs) -> rd.Dataset:
    files = path if isinstance(path, list) else transcript_files(path)
    return rd.read_parquet(files, columns=columns or PIPELINE_COLUMNS, **kwargs)
