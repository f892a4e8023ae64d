"""Stringless span persistence and the spans↔text re-join.

The reference's "security option": ``Ito.JsonEncoder(stringless=True)``
serializes span indices without the backing string, and
``JsonDecoderHook`` re-injects the string on load
(``/root/reference/pawpaw/ito.py:449-512``).  The tabular equivalent
(SURVEY.md §2.1/§2.4): write span tables WITHOUT the text column —
indices-only parquet is both smaller and safe to hand to systems that must
not see raw text — and re-join on the document key when the text is needed
again.

Scale shape: the re-join is Ray Data's native hash join
(``Dataset.join``, an all-to-all on the join key) with partition count
derived from the cluster; neither side is materialized on the driver.  For
a small spans side against a huge corpus, pass the spans through
``read_parquet`` filters first — the join only moves rows that survive.
"""

from __future__ import annotations


def strip_text(ds, text_col: str = "text"):
    """Stringless write path: drop the backing text before persisting a
    spans table (JsonEncoder ``stringless=True`` analog)."""
    return ds.drop_columns([text_col])


def rejoin_text(spans_ds, text_ds, on=("conv_id", "turn_idx"),
                text_col: str = "text", num_partitions: int | None = None):
    """Re-inject text into a stringless spans table (JsonDecoderHook
    analog): inner hash join on the document key.

    ``text_ds`` should be pruned to ``on + (text_col,)`` at the read — the
    join ships only the key and text columns of the corpus."""
    from pawpaw_ray.tuning import join_partitions

    if num_partitions is None:
        num_partitions = join_partitions()
    keep = list(on) + [text_col]
    extra = [c for c in (text_ds.columns() or []) if c not in keep]
    if extra:
        text_ds = text_ds.drop_columns(extra)
    return spans_ds.join(text_ds, join_type="inner",
                         num_partitions=num_partitions, on=tuple(on))


def surface_slices(batch, text_col: str = "text", start_col: str = "start",
                   stop_col: str = "stop", out_col: str = "surface"):
    """Surface extraction after a re-join: ``text[start:stop]`` per row.

    Arrow's ``utf8_slice_codeunits`` only takes scalar bounds, so per-row
    spans slice in Python — O(total surface bytes), not O(corpus)."""
    import pyarrow as pa

    texts = batch[text_col].to_pylist()
    starts = batch[start_col].to_pylist()
    stops = batch[stop_col].to_pylist()
    out = [t[s:e] if t is not None else None
           for t, s, e in zip(texts, starts, stops)]
    return batch.append_column(out_col, pa.array(out, pa.string()))
