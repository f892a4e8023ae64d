"""Pipeline-as-data: spec-built pipelines equal hand-built ones; user
stages register like Itorator.wrap."""

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_spec_equals_handbuilt(tiny_transcripts):
    import ray.data as rd

    from pawpaw_ray.pipelines.spec import build_pipeline
    from pawpaw_ray.sources.transcripts import read_transcripts
    from pawpaw_ray.stages.segment import segment_batch
    from pawpaw_ray.stages.select import make_select_batch

    ds = read_transcripts(tiny_transcripts).limit(200)
    spec = [
        {"stage": "segment"},
        {"stage": "select",
         "args": {"query_str": "**[d:word] & [i:0-4]",
                  "key_cols": ("conv_id", "turn_idx")}},
    ]
    a = build_pipeline(ds, spec).to_pandas()
    b = (ds.map_batches(segment_batch, batch_format="pyarrow")
         .map_batches(make_select_batch("**[d:word] & [i:0-4]",
                                        key_cols=("conv_id", "turn_idx")),
                      batch_format="pyarrow")
         .to_pandas())
    key = ["conv_id", "turn_idx", "start", "stop"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))
    assert len(a) > 100


@pytest.mark.usefixtures("ray_session")
def test_user_registered_stage(tiny_transcripts):
    from pawpaw_ray.pipelines.spec import build_pipeline, register_stage
    from pawpaw_ray.sources.transcripts import read_transcripts

    @register_stage("shout")
    def shout(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.set_column(
            batch.schema.get_field_index("text"), "text",
            pc.utf8_upper(batch["text"]))

    out = build_pipeline(read_transcripts(tiny_transcripts).limit(20),
                         [{"stage": "shout"}]).to_pandas()
    assert out["text"].str.isupper().all()


def test_unknown_stage_errors():
    from pawpaw_ray.pipelines.spec import build_pipeline

    with pytest.raises(ValueError, match="unknown stage"):
        build_pipeline(None, [{"stage": "nope"}])
