"""Differential tests: the span __format__ mini-language (kernels/fmt.py)
vs reference `format(ito, spec)` (`/root/reference/pawpaw/ito.py:598-716`)
on a spec grid, plus the Dataset stage."""

import pytest

from pawpaw_ray.kernels.fmt import format_span, make_format_batch

TEXT = "She spoke; Dr. Smith listened carefully to the answer."
CASES = [
    (0, len(TEXT), None),
    (11, 20, "person"),          # "Dr. Smith"
    (21, 29, "verb"),            # "listened"
    (4, 9, None),                # "spoke"
]

SPECS = [
    "",
    "%span",
    "%start",
    "%stop",
    "%span:04d",
    "%start:+d/%stop:>6",
    "%substr",
    "%desc",
    "%string",
    "%value",
    "%desc of [%substr] at %span",
    "%substr!r",
    "%substr!a",
    "%substr!2r",
    "%substr!2r1",
    "%substr:6",
    "%substr:6…",
    "%substr:<6…",
    "%substr:^7--",
    "%substr:>9...",
    "%substr:2abcdef",   # abbr longer than width
    "%desc:3",
    "% ",                # zero-width space: removed
    "a% b",
    "100%% sure %substr",
    "%unknown stays",    # unknown directive left literal
    "%",                 # trailing lone escape
    "%span %substr %desc %start %stop",
]


@pytest.mark.parametrize("start,stop,desc", CASES)
def test_format_grid_matches_reference(pawpaw_ref, start, stop, desc):
    pp = pawpaw_ref
    ito = pp.Ito(TEXT, start, stop, desc)
    for spec in SPECS:
        theirs = format(ito, spec)
        ours = format_span(spec, TEXT, start, stop, desc)
        assert ours == theirs, f"spec={spec!r} span=({start},{stop})"


def test_format_value_override(pawpaw_ref):
    pp = pawpaw_ref
    ito = pp.Ito(TEXT, 4, 9)
    ito.value_func = lambda i: 42
    assert format_span("%value!r", TEXT, 4, 9, value=42) \
        == format(ito, "%value!r")
    assert format_span("v=%value", TEXT, 4, 9, value=42) \
        == format(ito, "v=%value")


def test_format_batch_stage(ray_session):
    import ray.data as rd

    rows = [{"text": TEXT, "start": s, "stop": e, "desc": d}
            for s, e, d in CASES]
    out = (rd.from_items(rows)
           .map_batches(make_format_batch("%desc:%substr @ %span"),
                        batch_format="pyarrow")
           .take_all())
    for row in out:
        assert row["formatted"] == format_span(
            "%desc:%substr @ %span", TEXT, row["start"], row["stop"],
            row["desc"])
    assert out[1]["formatted"].startswith("person:Dr. Smith @ (11, 20)")
