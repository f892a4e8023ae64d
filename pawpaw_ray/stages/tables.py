"""Table-extraction stage: tool-output turns → parsed table-cell rows.

Stateless ``map_batches`` flat-map: rows in are transcript turns, rows out
are one row per table body row with its parsed cells — the structure a
downstream pipeline joins or aggregates on.  Input is pre-filtered to tool
turns with a vectorized ``pyarrow.compute`` mask (no regex on the ~90% of
turns that cannot contain a table).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from pawpaw_ray.kernels.tables import extract_grid_tables

TABLE_ROW_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("table_idx", pa.int32()),
    ("row_idx", pa.int32()),
    ("start", pa.int32()),
    ("stop", pa.int32()),
    ("header", pa.list_(pa.string())),
    ("cells", pa.list_(pa.string())),
])


def filter_tool_turns(batch: pa.Table, role_col: str = "role") -> pa.Table:
    if role_col not in batch.column_names:
        return batch
    return batch.filter(pc.equal(batch[role_col], "tool"))


def extract_tables_batch(batch: pa.Table) -> pa.Table:
    """map_batches UDF: turns → table-cell rows (flat-map)."""
    texts = batch["text"].to_pylist()
    conv = batch["conv_id"].to_pylist()
    tidx = batch["turn_idx"].to_pylist()

    cols: dict[str, list] = {name: [] for name in TABLE_ROW_SCHEMA.names}
    for i, text in enumerate(texts):
        if not text or "+" not in text:
            continue
        for t_i, tbl in enumerate(extract_grid_tables(text)):
            for r_i, cells in enumerate(tbl["rows"]):
                cols["conv_id"].append(conv[i])
                cols["turn_idx"].append(tidx[i])
                cols["table_idx"].append(t_i)
                cols["row_idx"].append(r_i)
                cols["start"].append(tbl["start"])
                cols["stop"].append(tbl["stop"])
                cols["header"].append(tbl["header"])
                cols["cells"].append(cells)
    return pa.table(
        {n: pa.array(cols[n], TABLE_ROW_SCHEMA.field(n).type)
         for n in TABLE_ROW_SCHEMA.names},
        schema=TABLE_ROW_SCHEMA)
