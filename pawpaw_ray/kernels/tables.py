"""ASCII-table extraction from unstructured text.

Re-implements the reference's style-driven table grammar
(``/root/reference/pawpaw/table/table.py:19-66`` — ``TableStyle`` dataclass
+ ``StyledTable._build_re`` composition with equidistant-indent prefilter,
named styles ``/root/reference/pawpaw/table/styles/styles.py:27-53``) and
adds a GRID style for the ``+---+---+`` bordered tables that agent tool
output typically contains (the reference styles all require a separator
line between body rows; grid tables have none).

Patterns compile once at import; matching is windowed ``pos``/``endpos``
per row inside batch UDFs (see stages/tables.py).
"""

from __future__ import annotations

import dataclasses

import regex as rx

from pawpaw_ray.kernels import guard

_PAT_INDENT = r"[ \t]*"

# equidistant-indentation chunk prefilter (table.py:32-33)
EQUI_INDENT_RE = rx.compile(
    rf"(?<=^|\n)(?P<chunk>(?P<indent>{_PAT_INDENT})[^ \t][^\n]+?\n"
    rf"(?:(?P=indent)[^ \t][^\n]+?(?:\n|$))+)",
    rx.DOTALL,
)


@dataclasses.dataclass
class TableStyle:
    """Mirror of the reference's style dataclass (table.py:19-27)."""

    pre_caption_pat: str | None = None
    table_start_pat: str = ""
    header_row_end_pat: str | None = None
    row_sep_pat: str = ""
    table_end_pat: str | None = None
    post_caption_pat: str | None = None
    equi_distant_indent: bool = True


def build_table_re(style: TableStyle):
    """Compose the table regex for a style — same grammar as the reference
    builder (table.py:35-66): optional pre-caption, start line, optional
    header row + terminator, separator-delimited body rows, optional end
    line and post-caption, all sharing one captured indent."""
    re = r"(?<=^|\n)"
    if style.equi_distant_indent:
        re = rf"(?P<indent>{_PAT_INDENT})"
        pat_indent = r"(?P=indent)"
    else:
        pat_indent = r""

    re += r"(?<table>"
    if style.pre_caption_pat is not None:
        re += rf"(?:(?<pre_caption>{style.pre_caption_pat})\n{pat_indent})?"
    re += rf"{style.table_start_pat}"
    if style.header_row_end_pat is not None:
        re += rf"(?:\n{pat_indent}(?<header_row>.+?)\n{pat_indent}{style.header_row_end_pat})?"
    if style.table_end_pat is None:
        re += rf"(?:\n{pat_indent}(?<row>.+?)\n{pat_indent}{style.row_sep_pat})+"
    else:
        re += rf"(?:\n{pat_indent}(?<row>.+?)\n{pat_indent}{style.row_sep_pat})*\n{pat_indent}(?<row>.+?)"
        re += rf"\n{pat_indent}{style.table_end_pat}"
    if style.post_caption_pat is not None:
        re += rf"\n{pat_indent}(?<post_caption>{style.post_caption_pat})(?=\n|$)"
    re += r")(?=$|\n)"
    return rx.compile(re, rx.DOTALL)


# named styles (styles.py:27-53)
_P1 = r"(?:-{2,}(?:\+-+)+)"
TYPE_1 = TableStyle(table_start_pat=_P1, row_sep_pat=_P1,
                    equi_distant_indent=False)

_P2 = r"-{2,}"
TYPE_2 = TableStyle(table_start_pat=_P2, row_sep_pat=r"\|(?:-+\|)+",
                    table_end_pat=_P2, equi_distant_indent=True)

TYPE_1_RE = build_table_re(TYPE_1)
TYPE_2_RE = build_table_re(TYPE_2)

# GRID (ours): +----+----+ bordered tables with consecutive | rows — the
# shape agent tool output emits.  Repeated captures of <row> carry every
# body row (regex module .spans()).
GRID_RE = rx.compile(
    r"(?<=^|\n)(?P<table>(?P<border>\+(?:-+\+)+)\n"
    r"(?:\|(?P<header_row>[^\n]*)\|\n(?P=border)\n)?"
    r"(?:\|(?P<row>[^\n]*)\|\n)+"
    r"(?P=border))(?=$|\n)",
    rx.DOTALL,
)

CELL_SEP_RE = rx.compile(r"\s*\|\s*")


def split_cells(row_text: str) -> list[str]:
    """``' item-04 | 621 '`` → ``['item-04', '621']``."""
    return [c.strip() for c in row_text.split("|")]


def extract_grid_tables(text: str, span: tuple[int, int] | None = None) -> list[dict]:
    """All GRID tables in ``text`` → [{header: [cells]|None,
    rows: [[cells]...], start, stop}]."""
    s, e = span or (0, len(text))
    out = []
    for m in guard.finditer(GRID_RE, text, s, e, trusted=True):
        header = m.group("header_row")
        out.append({
            "header": split_cells(header) if header is not None else None,
            "rows": [split_cells(r) for r in m.captures("row")],
            "start": m.start("table"),
            "stop": m.end("table"),
        })
    return out
