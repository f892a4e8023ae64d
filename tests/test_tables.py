"""Table extraction: differential parity of the style builder vs the
reference's, and grid-table parsing of fixture tool turns."""

import pyarrow as pa

from pawpaw_ray.kernels.tables import (
    TYPE_1,
    TYPE_2,
    build_table_re,
    extract_grid_tables,
    split_cells,
)
from pawpaw_ray.stages.tables import extract_tables_batch, filter_tool_turns

TYPE1_TEXT = (
    "preamble text\n"
    "-----+-----+-----\n"
    "  A  |  B  |  C\n"
    "-----+-----+-----\n"
    " aaa | bbb | ccc\n"
    "-----+-----+-----\n"
    "postamble"
)

TYPE2_TEXT = (
    "before\n"
    "  -------------------\n"
    "  |  A  |  B  |  C  |\n"
    "  |-----------------|\n"
    "  | aaa | bbb | ccc |\n"
    "  -------------------\n"
    "after"
)

GRID_TEXT = (
    "tool output:\n"
    "+----------+------+\n"
    "| name     | qty  |\n"
    "+----------+------+\n"
    "| item-04 | 621 |\n"
    "| item-65 | 585 |\n"
    "+----------+------+\n"
    "tail prose"
)


def test_style_builder_matches_reference(pawpaw_ref):
    """Our builder must emit a regex with the same captures at the same
    spans as the reference's StyledTable for both named styles."""
    pp = pawpaw_ref
    from pawpaw.table import styles as pp_styles

    for ours_style, theirs_style, text in [
        (TYPE_1, pp_styles.TYPE_1, TYPE1_TEXT),
        (TYPE_2, pp_styles.TYPE_2, TYPE2_TEXT),
    ]:
        ours_re = build_table_re(ours_style)
        theirs = pp.table.StyledTable(theirs_style)
        m_ours = list(ours_re.finditer(text))
        m_theirs = list(theirs.re.finditer(text))
        assert len(m_ours) == len(m_theirs) == 1
        for gk in ("table", "row"):
            assert m_ours[0].spans(gk) == m_theirs[0].spans(gk), gk


def test_reference_itorator_spans_match(pawpaw_ref):
    """Run the reference's full StyledTable itorator pipeline and check the
    row spans we extract agree."""
    pp = pawpaw_ref
    from pawpaw.table import styles as pp_styles

    itor = pp.table.StyledTable(pp_styles.TYPE_1).get_itor()
    doc = pp.Ito(TYPE1_TEXT)
    theirs = [(i.desc, i.start, i.stop) for i in itor(doc)
              for i in [i, *i.children]]
    row_spans_theirs = [(s, e) for d, s, e in theirs if d == "row"]

    m = build_table_re(TYPE_1).search(TYPE1_TEXT)
    assert m.spans("row") == row_spans_theirs


def test_grid_extraction():
    tables = extract_grid_tables(GRID_TEXT)
    assert len(tables) == 1
    t = tables[0]
    assert t["header"] == ["name", "qty"]
    assert t["rows"] == [["item-04", "621"], ["item-65", "585"]]
    assert GRID_TEXT[t["start"]:t["stop"]].startswith("+---")


def test_split_cells():
    assert split_cells(" a | b  |c") == ["a", "b", "c"]


def test_extract_tables_batch_on_fixture(tiny_transcripts):
    import glob
    import os

    import pyarrow.parquet as pq

    f = sorted(glob.glob(os.path.join(tiny_transcripts, "transcripts",
                                      "*.parquet")))[0]
    batch = filter_tool_turns(pq.read_table(f))
    out = extract_tables_batch(batch)
    assert out.num_rows > 0
    assert out.schema.names == ["conv_id", "turn_idx", "table_idx", "row_idx",
                                "start", "stop", "header", "cells"]
    # every emitted row's cells are non-empty and match its header arity
    cells = out["cells"].to_pylist()
    headers = out["header"].to_pylist()
    assert all(h is None or len(h) == len(c) for h, c in zip(headers, cells))

    # sliced input must give identical results (zero-copy slice safety)
    sliced = extract_tables_batch(batch.slice(5, 40))
    full = extract_tables_batch(batch).to_pandas()
    sl = sliced.to_pandas()
    sub = full.merge(sl[["conv_id", "turn_idx"]].drop_duplicates(),
                     on=["conv_id", "turn_idx"])
    assert len(sl) == len(sub)
