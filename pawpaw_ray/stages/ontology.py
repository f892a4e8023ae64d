"""Ontology discovery as a Dataset stage.

Batch-level face of :mod:`pawpaw_ray.kernels.ontology`: ship the ontology
as a plain-data spec, compile it ONCE per worker process (regex state, not
work), run ``discover`` per row, and emit mentions either as a nested
``list<struct{path,start,stop}>`` column (``make_ontology_discover_batch``)
or as an exploded flat mention table (``ontology_mentions``) — the shape a
KG linker or the driver's oracle compare wants.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from pawpaw_ray.kernels.ontology import build_ontology, discoveries_to_rows

MENTION_STRUCT = pa.struct([
    ("path", pa.string()),
    ("start", pa.int32()),
    ("stop", pa.int32()),
])

_ONT_CACHE: dict[str, object] = {}


def _compiled(spec: dict):
    key = json.dumps(spec, sort_keys=True, default=str)
    ont = _ONT_CACHE.get(key)
    if ont is None:
        ont = _ONT_CACHE[key] = build_ontology(spec)
    return ont


def make_ontology_discover_batch(ontology: dict, text_col: str = "text",
                                 out_col: str = "mentions"):
    """``map_batches`` UDF: append a ``list<struct{path,start,stop}>``
    column with every concept discovery per row."""

    def ontology_discover_batch(batch: pa.Table) -> pa.Table:
        ont = _compiled(ontology)
        paths: list[str] = []
        starts: list[int] = []
        stops: list[int] = []
        offsets = [0]
        for t in batch[text_col].to_pylist():
            if t:
                for p, s, e in discoveries_to_rows(ont.discover_text(t)):
                    paths.append(p)
                    starts.append(s)
                    stops.append(e)
            offsets.append(len(paths))
        struct = pa.StructArray.from_arrays(
            [pa.array(paths, pa.string()),
             pa.array(np.asarray(starts, np.int32), pa.int32()),
             pa.array(np.asarray(stops, np.int32), pa.int32())],
            fields=list(MENTION_STRUCT))
        col = pa.ListArray.from_arrays(
            pa.array(np.asarray(offsets, np.int32), pa.int32()), struct)
        return batch.append_column(out_col, col)

    return ontology_discover_batch


def make_ontology_mentions_batch(ontology: dict, id_col: str = "doc_id",
                                 text_col: str = "text",
                                 include_surface: bool = True):
    """``map_batches`` UDF emitting the exploded mention table
    ``(id, path, start, stop[, surface])`` — rows multiply, text stays
    behind (only the matched surface slices travel)."""

    def ontology_mentions_batch(batch: pa.Table) -> pa.Table:
        ont = _compiled(ontology)
        ids, paths, starts, stops, surfaces = [], [], [], [], []
        id_vals = batch[id_col].to_pylist()
        for rid, t in zip(id_vals, batch[text_col].to_pylist()):
            if not t:
                continue
            for p, s, e in discoveries_to_rows(ont.discover_text(t)):
                ids.append(rid)
                paths.append(p)
                starts.append(s)
                stops.append(e)
                if include_surface:
                    surfaces.append(t[s:e])
        cols = {
            id_col: pa.array(ids, batch[id_col].type),
            "path": pa.array(paths, pa.string()),
            "start": pa.array(np.asarray(starts, np.int32), pa.int32()),
            "stop": pa.array(np.asarray(stops, np.int32), pa.int32()),
        }
        if include_surface:
            cols["surface"] = pa.array(surfaces, pa.string())
        return pa.table(cols)

    return ontology_mentions_batch


def ontology_mentions(ds, ontology: dict, id_col: str = "doc_id",
                      text_col: str = "text", include_surface: bool = True,
                      batch_size: int | None = None):
    """Exploded mention table over a Dataset (streaming; no shuffle)."""
    return ds.map_batches(
        make_ontology_mentions_batch(ontology, id_col, text_col,
                                     include_surface),
        batch_format="pyarrow", batch_size=batch_size)
