"""Stringless spans↔text round trip (SURVEY §2.1: the reference
JsonEncoder(stringless=True) / JsonDecoderHook "security option",
`/root/reference/pawpaw/ito.py:449-512`, as a parquet-write + hash-join)."""

import os

import pandas as pd
import pytest

from pawpaw_ray.stages.rejoin import rejoin_text, strip_text, surface_slices


@pytest.mark.usefixtures("ray_session")
def test_stringless_round_trip(tmp_path):
    import ray.data as rd

    texts = {
        ("c0", 0): "Mary met John at the office on Tuesday.",
        ("c0", 1): "She gave him the quarterly report.",
        ("c1", 0): "The vehicle was a Mustang GT, not an F-150.",
        ("c1", 1): "No spans reference this turn's text.",
    }
    text_rows = [{"conv_id": c, "turn_idx": t, "text": s, "meta": "x"}
                 for (c, t), s in texts.items()]
    span_rows = []
    for (c, t), s in texts.items():
        if t == 1 and c == "c1":
            continue  # one text row without spans: inner join must drop it
        for w in ("Mary", "John", "report", "Mustang", "office"):
            i = s.find(w)
            if i >= 0:
                span_rows.append({"conv_id": c, "turn_idx": t, "start": i,
                                  "stop": i + len(w), "text": s})

    spans_ds = rd.from_items(span_rows)
    # stringless write: indices only, no text column on disk
    out = str(tmp_path / "spans")
    strip_text(spans_ds).write_parquet(out)
    on_disk = pd.read_parquet(out)
    assert "text" not in on_disk.columns and len(on_disk) == len(span_rows)

    # re-join on the document key, re-slice surfaces
    rejoined = rejoin_text(
        rd.read_parquet(out), rd.from_items(text_rows),
        on=("conv_id", "turn_idx"), num_partitions=4)
    got = rejoined.map_batches(surface_slices, batch_format="pyarrow")
    df = got.to_pandas().sort_values(
        ["conv_id", "turn_idx", "start"]).reset_index(drop=True)

    want = pd.DataFrame(
        sorted(((r["conv_id"], r["turn_idx"], r["start"], r["stop"],
                 r["text"][r["start"]:r["stop"]]) for r in span_rows)),
        columns=["conv_id", "turn_idx", "start", "stop", "surface"])
    assert df[["conv_id", "turn_idx", "start", "stop", "surface"]].equals(want)
    # the non-span text row must not appear; text itself restored verbatim
    assert set(map(tuple, df[["conv_id", "turn_idx"]].drop_duplicates()
                   .itertuples(index=False))) == {("c0", 0), ("c0", 1),
                                                  ("c1", 0)}
    for _, row in df.iterrows():
        assert row["text"] == texts[(row["conv_id"], row["turn_idx"])]


@pytest.mark.usefixtures("ray_session")
def test_rejoin_prunes_extra_text_columns(tmp_path):
    """Only key + text columns of the corpus cross the join."""
    import ray.data as rd

    text_ds = rd.from_items([
        {"conv_id": "c", "turn_idx": i, "text": f"t{i}", "huge_blob": "z" * 10}
        for i in range(3)])
    spans_ds = rd.from_items([
        {"conv_id": "c", "turn_idx": i, "start": 0, "stop": 2}
        for i in range(3)])
    out = rejoin_text(spans_ds, text_ds, num_partitions=2)
    cols = set(out.columns())
    assert "huge_blob" not in cols and {"text", "start", "stop"} <= cols
    assert out.count() == 3
