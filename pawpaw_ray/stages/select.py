"""plumule-select stage: run a compiled tree query over every row's span
tree and explode the matches to rows.

The query string is compiled ONCE per worker process (module-level cache);
evaluation is row-local index arithmetic over the flat ``spans`` column —
no shuffle, streams under backpressure like any other ``map_batches`` stage
(SURVEY.md §2.10 Ray mapping).
"""

from __future__ import annotations

import pyarrow as pa

from pawpaw_ray.kernels.nlp import DESC_VOCAB
from pawpaw_ray.kernels.query import Query, TreeView
from pawpaw_ray.stages.segment import tree_rows

_QUERY_CACHE: dict[str, Query] = {}


def _compiled(path: str) -> Query:
    q = _QUERY_CACHE.get(path)
    if q is None:
        q = _QUERY_CACHE[path] = Query(path)
    return q


def make_select_batch(query_str: str, key_cols: tuple[str, ...] = ("doc_id",),
                      text_col: str = "text"):
    """Build a map_batches UDF: segmented batch in, matched-node rows out.

    Output columns: ``*key_cols, start, stop, desc, match`` — one row per
    node the query selects, in query order.
    """

    def select_batch(batch: pa.Table) -> pa.Table:
        query = _compiled(query_str)
        texts = batch[text_col].to_pylist()
        keys = {k: batch[k].to_pylist() for k in key_cols}

        out_keys: dict[str, list] = {k: [] for k in key_cols}
        o_start: list[int] = []
        o_stop: list[int] = []
        o_desc: list[str] = []
        o_match: list[str] = []
        for i, starts, stops, descs, parents in tree_rows(batch):
            text = texts[i] or ""
            tree = TreeView.from_ids(text, starts, stops, descs, parents, DESC_VOCAB)
            for n in query.find_all(tree):
                for k in key_cols:
                    out_keys[k].append(keys[k][i])
                o_start.append(int(starts[n]))
                o_stop.append(int(stops[n]))
                o_desc.append(tree.descs[n])
                o_match.append(tree.substr(n))

        cols: dict[str, pa.Array] = {}
        for k in key_cols:
            cols[k] = pa.array(out_keys[k], batch.schema.field(k).type)
        cols["start"] = pa.array(o_start, pa.int32())
        cols["stop"] = pa.array(o_stop, pa.int32())
        cols["desc"] = pa.array(o_desc, pa.string())
        cols["match"] = pa.array(o_match, pa.string())
        return pa.table(cols)

    return select_batch
