"""Resumable runner: manifests, skip-on-resume, identical final output."""

import json
import os
import shutil

import pandas as pd
import pytest

from pawpaw_ray.pipelines.runner import run_resumable
from pawpaw_ray.state.manifests import is_complete, read_manifests, write_manifest


def test_manifest_roundtrip(tmp_path):
    root = str(tmp_path)
    assert not is_complete(root, "part-00000")
    write_manifest(root, "part-00000", {"rows": 5})
    assert is_complete(root, "part-00000")
    assert read_manifests(root)["part-00000"]["rows"] == 5


@pytest.mark.usefixtures("ray_session")
def test_run_and_resume(tiny_transcripts, tmp_path):
    out = str(tmp_path / "kg")
    r1 = run_resumable(tiny_transcripts, out, n_shards=2)
    assert r1["triples"] > 500 and r1["shards_run"] == 1  # single input file
    t1 = pd.read_parquet(os.path.join(out, "triples")).sort_values(
        ["subj_key", "pred", "obj_key"]).reset_index(drop=True)

    # resume: phase A shards must be skipped, final output identical
    r2 = run_resumable(tiny_transcripts, out, n_shards=2)
    assert r2["shards_run"] == 0 and r2["shards_skipped"] == 1
    t2 = pd.read_parquet(os.path.join(out, "triples")).sort_values(
        ["subj_key", "pred", "obj_key"]).reset_index(drop=True)
    cols = ["subj_key", "pred", "obj_key", "conv_id", "turn_idx", "n_dups"]
    assert t1[cols].equals(t2[cols])

    # lineage manifests record inputs + rows
    ms = read_manifests(out)
    assert ms["part-00000"]["rows"] == r1["raw_triples"]
    assert ms["part-00000"]["inputs"]
    assert ms["final"]["triples"] == r1["triples"]

    # corrupt one manifest → that shard (and only it) reruns
    mp = os.path.join(out, "_manifests", "part-00000.json")
    with open(mp, "w") as f:
        f.write("{broken")
    r3 = run_resumable(tiny_transcripts, out, n_shards=2)
    assert r3["shards_run"] == 1
