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


@pytest.mark.usefixtures("ray_session")
def test_resume_invalidates_on_reshard(tiny_transcripts, tmp_path):
    """A manifest proves completeness only for the same inputs: rerunning
    with a different n_shards must redo mismatched shards and prune stale
    part dirs, not silently reuse them (round-1 advice item)."""
    import glob

    import pyarrow.parquet as pq

    # split the fixture into 4 input files so shard plans can differ
    files = sorted(glob.glob(os.path.join(tiny_transcripts, "transcripts",
                                          "*.parquet"))) or \
        sorted(glob.glob(os.path.join(tiny_transcripts, "*.parquet")))
    files = [f for f in files if not f.endswith("alias_catalog.parquet")]
    full = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    src = tmp_path / "split_in"
    src.mkdir()
    quarter = (len(full) + 3) // 4
    for i in range(4):
        full.iloc[i * quarter:(i + 1) * quarter].to_parquet(
            src / f"part-{i}.parquet")
    catalog = pq.read_table(os.path.join(tiny_transcripts,
                                         "alias_catalog.parquet"))

    out = str(tmp_path / "kg")
    run_resumable(str(src), out, catalog=catalog, n_shards=4)
    assert len(os.listdir(os.path.join(out, "triples_raw"))) == 4

    # rerun with 2 shards: all 4 old manifests mismatch → 2 fresh shards,
    # stale part dirs pruned, output identical to a from-scratch 2-shard run
    r2 = run_resumable(str(src), out, catalog=catalog, n_shards=2)
    assert r2["shards_run"] == 2 and r2["shards_skipped"] == 0
    parts = sorted(os.listdir(os.path.join(out, "triples_raw")))
    assert parts == ["part-00000", "part-00001"]

    fresh = str(tmp_path / "kg_fresh")
    run_resumable(str(src), fresh, catalog=catalog, n_shards=2)
    key = ["subj_key", "pred", "obj_key"]
    a = pd.read_parquet(os.path.join(out, "triples")).sort_values(
        key).reset_index(drop=True)
    b = pd.read_parquet(os.path.join(fresh, "triples")).sort_values(
        key).reset_index(drop=True)
    assert a[key + ["n_dups"]].equals(b[key + ["n_dups"]])

    # unchanged rerun still skips both shards
    r3 = run_resumable(str(src), out, catalog=catalog, n_shards=2)
    assert r3["shards_run"] == 0 and r3["shards_skipped"] == 2


@pytest.mark.usefixtures("ray_session")
def test_run_incremental_ingest(tiny_transcripts, tmp_path):
    """Ongoing-ingest mode: adding new input shard files to a completed run
    executes ONLY the new files, the combined output equals a fresh full
    run, a no-change rerun skips phase B, and removed inputs are pruned."""
    import glob

    import pyarrow.parquet as pq

    from pawpaw_ray.pipelines.runner import run_incremental

    files = sorted(glob.glob(os.path.join(tiny_transcripts, "transcripts",
                                          "*.parquet"))) or \
        sorted(glob.glob(os.path.join(tiny_transcripts, "*.parquet")))
    files = [f for f in files if not f.endswith("alias_catalog.parquet")]
    full = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    catalog = pq.read_table(os.path.join(tiny_transcripts,
                                         "alias_catalog.parquet"))
    quarter = (len(full) + 3) // 4
    chunks = [full.iloc[i * quarter:(i + 1) * quarter] for i in range(4)]

    src = tmp_path / "ingest_in"
    src.mkdir()
    for i in range(2):
        chunks[i].to_parquet(src / f"shard-{i}.parquet")

    out = str(tmp_path / "kg_inc")
    r1 = run_incremental(str(src), out, catalog=catalog)
    assert r1["shards_run"] == 2 and r1["shards_skipped"] == 0

    # drop two NEW shard files in: only they run, old partitions skipped
    for i in range(2, 4):
        chunks[i].to_parquet(src / f"shard-{i}.parquet")
    r2 = run_incremental(str(src), out, catalog=catalog)
    assert r2["shards_run"] == 2 and r2["shards_skipped"] == 2
    assert r2["phase_b"] == "ran"

    # combined output == fresh full run over all four files
    src_full = tmp_path / "ingest_full"
    src_full.mkdir()
    for i in range(4):
        chunks[i].to_parquet(src_full / f"shard-{i}.parquet")
    out_full = str(tmp_path / "kg_full")
    rf = run_incremental(str(src_full), out_full, catalog=catalog)
    cols = ["subj_key", "pred", "obj_key", "conv_id", "turn_idx", "n_dups"]
    t_inc = pd.read_parquet(os.path.join(out, "triples"))[cols] \
        .sort_values(cols).reset_index(drop=True)
    t_full = pd.read_parquet(os.path.join(out_full, "triples"))[cols] \
        .sort_values(cols).reset_index(drop=True)
    assert rf["triples"] == r2["triples"]
    assert t_inc.equals(t_full)

    # no-change rerun: nothing executes, phase B skipped
    r3 = run_incremental(str(src), out, catalog=catalog)
    assert r3["shards_run"] == 0 and r3["shards_skipped"] == 4
    assert r3["phase_b"] == "skipped"

    # removing an input file prunes its partition and reruns phase B
    os.remove(src / "shard-3.parquet")
    r4 = run_incremental(str(src), out, catalog=catalog)
    assert r4["shards_run"] == 0 and r4["shards_skipped"] == 3
    assert r4["shards_removed"] == 1 and r4["phase_b"] == "ran"
    iparts = [p for p in os.listdir(os.path.join(out, "triples_raw"))
              if p.startswith("ipart-")]
    assert len(iparts) == 3
