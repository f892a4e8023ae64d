"""Arborform-pipeline stage: run a connector-DAG spec over every row.

The batch-level face of :mod:`pawpaw_ray.kernels.arborform`: compile the
pipeline spec ONCE per worker process (regexes and the itor graph are
state; batches are work), run it per row, and emit the resulting span tree
as an Arrow ``spans`` list column with free-form string descs
(``list<struct{start,stop,desc:string,parent}>`` — the general-vocabulary
variant of stages/segment.py's fixed-vocabulary encoding).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from pawpaw_ray.kernels.arborform import build_itor, flatten_tree, run_pipeline

SPAN_STRUCT_STR = pa.struct([
    ("start", pa.int32()),
    ("stop", pa.int32()),
    ("desc", pa.string()),
    ("parent", pa.int32()),
])
SPANS_STR_TYPE = pa.list_(SPAN_STRUCT_STR)

_ITOR_CACHE: dict[str, object] = {}


def _compiled(pipeline: dict):
    key = json.dumps(pipeline, sort_keys=True, default=str)
    itor = _ITOR_CACHE.get(key)
    if itor is None:
        itor = _ITOR_CACHE[key] = build_itor(pipeline)
    return itor


def make_arborform_batch(pipeline: dict, text_col: str = "text",
                         root_desc: str | None = "Document",
                         out_col: str = "spans"):
    """Build a ``map_batches`` UDF applying the pipeline spec per row."""

    def arborform_batch(batch: pa.Table) -> pa.Table:
        itor = _compiled(pipeline)
        all_s: list[int] = []
        all_e: list[int] = []
        all_d: list[str | None] = []
        all_p: list[int] = []
        offsets = [0]
        for t in batch[text_col].to_pylist():
            if t:
                root = run_pipeline(t, itor, root_desc=root_desc)
                s, e, d, p = flatten_tree([root])
                all_s.extend(s)
                all_e.extend(e)
                all_d.extend(d)
                all_p.extend(p)  # row-local indices, like stages/segment.py
            offsets.append(len(all_s))
        struct = pa.StructArray.from_arrays(
            [pa.array(np.asarray(all_s, dtype=np.int32), pa.int32()),
             pa.array(np.asarray(all_e, dtype=np.int32), pa.int32()),
             pa.array(all_d, pa.string()),
             pa.array(np.asarray(all_p, dtype=np.int32), pa.int32())],
            fields=list(SPAN_STRUCT_STR))
        col = pa.ListArray.from_arrays(
            pa.array(np.asarray(offsets, dtype=np.int32), pa.int32()), struct)
        return batch.append_column(out_col, col)

    return arborform_batch
