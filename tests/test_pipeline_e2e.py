"""End-to-end pipeline tests over the tiny transcript fixture (needs Ray)."""

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from pawpaw_ray.pipelines.kg import build_kg, extract_linked_triples
from pawpaw_ray.sources.transcripts import read_transcripts


@pytest.fixture(scope="module")
def kg_outputs(tiny_transcripts):
    cat = pq.read_table(tiny_transcripts + "/alias_catalog.parquet")
    ds = read_transcripts(tiny_transcripts)
    out = build_kg(ds, cat, linker_concurrency=2)
    return {
        "triples": out["triples"].to_pandas(),
        "entities": out["entities"].to_pandas(),
    }


def test_triples_nonempty_and_schema(kg_outputs):
    t = kg_outputs["triples"]
    assert len(t) > 500
    for col in ("conv_id", "turn_idx", "subj", "pred", "obj", "subj_key",
                "obj_key", "via_coref", "n_dups"):
        assert col in t.columns, col
    assert t["subj_key"].notna().all()          # nulls excluded by dedup
    assert (t["n_dups"] >= 1).all()


def test_dedup_is_exact(kg_outputs):
    t = kg_outputs["triples"]
    assert not t.duplicated(["subj_key", "pred", "obj_key"]).any()


def test_coref_resolved_some_pronouns(kg_outputs):
    t = kg_outputs["triples"]
    resolved = t[t["via_coref"]]
    assert len(resolved) > 10
    # every coref-resolved subject is a person entity
    assert resolved["subj_path"].str.startswith("person").all()
    assert resolved["subj"].isin(["He", "She", "They", "It"]).all()


def test_entities_deterministic_and_consistent(kg_outputs):
    e = kg_outputs["entities"]
    assert e["entity_id"].is_unique
    linked = e[~e["entity_id"].str.startswith("unk-")]
    assert (linked["n_mentions"] >= 1).all()
    assert len(linked) > 100


def test_pipeline_is_deterministic(tiny_transcripts):
    cat = pq.read_table(tiny_transcripts + "/alias_catalog.parquet")
    a = build_kg(read_transcripts(tiny_transcripts), cat)["triples"].to_pandas()
    b = build_kg(read_transcripts(tiny_transcripts), cat)["triples"].to_pandas()
    key = ["subj_key", "pred", "obj_key"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a[key + ["conv_id", "turn_idx", "n_dups", "via_coref"]].equals(
        b[key + ["conv_id", "turn_idx", "n_dups", "via_coref"]])


def test_turn_order_invariant(tiny_transcripts):
    """Per-turn text equality under stable turn ordering (input_hint
    invariant): the shuffled row order of the input must not affect which
    (conv_id, turn_idx) → text mapping the pipeline sees."""
    import ray.data as rd
    ds = read_transcripts(tiny_transcripts)
    pdf = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # no duplicate turns, contiguous turn_idx per conversation
    assert not pdf.duplicated(["conv_id", "turn_idx"]).any()
    per_conv = pdf.groupby("conv_id")["turn_idx"]
    assert (per_conv.min() == 0).all()
    assert (per_conv.max() + 1 == per_conv.count()).all()

    # the pipeline's output must be invariant to input ROW ORDER: the
    # conv-ordered shuffle restores stable turn ordering internally
    cat = pq.read_table(tiny_transcripts + "/alias_catalog.parquet")
    shuffled = rd.from_pandas(
        pdf.sample(frac=1.0, random_state=3).reset_index(drop=True)
    ).repartition(5)
    key = ["subj_key", "pred", "obj_key"]
    cols = key + ["conv_id", "turn_idx", "via_coref", "n_dups"]
    a = (build_kg(rd.from_pandas(pdf).repartition(5), cat)["triples"]
         .to_pandas().sort_values(key).reset_index(drop=True))
    b = (build_kg(shuffled, cat)["triples"]
         .to_pandas().sort_values(key).reset_index(drop=True))
    assert a[cols].equals(b[cols])


def test_linked_triples_streaming_schema(tiny_transcripts):
    cat = pq.read_table(tiny_transcripts + "/alias_catalog.parquet")
    ds = read_transcripts(tiny_transcripts)
    linked = extract_linked_triples(ds, cat, linker_concurrency=2)
    batch = next(iter(linked.iter_batches(batch_size=64, batch_format="pyarrow")))
    assert {"subj_id", "obj_id", "subj_canonical"} <= set(batch.column_names)
    linked_ratio = pc.sum(pc.is_valid(batch["obj_id"])).as_py() / max(1, len(batch))
    assert linked_ratio > 0.3


def test_pipeline_robust_to_degenerate_text(tiny_transcripts):
    """Null, empty, whitespace-only, unicode, and 50kB single-line turns
    flow through the full pipeline without error; coref counts turn
    DISTANCE across degenerate turns."""
    import pandas as pd
    import ray.data as rd

    cat = pq.read_table(tiny_transcripts + "/alias_catalog.parquet")
    rows = [
        {"conv_id": "c1", "turn_idx": 0,
         "text": "Alice Brandt founded Acme. 日本語のテキスト。emoji 🎉 here."},
        {"conv_id": "c1", "turn_idx": 1, "text": None},
        {"conv_id": "c1", "turn_idx": 2, "text": ""},
        {"conv_id": "c1", "turn_idx": 3, "text": "He acquired Dunmore Heights."},
        {"conv_id": "c2", "turn_idx": 0, "text": "   \n\n\t  "},
        {"conv_id": "c2", "turn_idx": 1, "text": "x" * 50_000 + ". The End met Acme."},
    ]
    out = build_kg(rd.from_pandas(pd.DataFrame(rows)), cat)
    t = out["triples"].to_pandas()
    assert len(t) == 3
    he = t[t["subj"] == "He"].iloc[0]
    assert he["via_coref"] and he["subj_canonical"] == "Alice Brandt"
    # reference sentence rules are English-centric: no boundary before a
    # Japanese char — the object legitimately spans to end of paragraph
    assert t[t["pred"] == "founded"].iloc[0]["obj"].startswith("Acme.")
