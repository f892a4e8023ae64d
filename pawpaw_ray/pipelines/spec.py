"""Pipeline-as-data: build a Dataset pipeline from a list of step configs.

The reference's extension surface is ``Itorator.wrap`` + a ``connections``
list of connector objects (``/root/reference/pawpaw/arborform/itorator/
itorator.py:35-70,85-90``): a pipeline is *data* describing steps.  Ours is
the batch-level analog (SURVEY.md §2.12): a registry of named stage
factories and a spec list

    [{"stage": "segment"},
     {"stage": "select", "args": {"query_str": "**[d:sentence]"}},
     {"stage": "filter", "args": {"expr": "n_tokens > 10"}}]

compiled onto any ``ray.data.Dataset`` with ``build_pipeline``.  Users
extend the engine by registering a batch UDF (``fn(pa.Table) -> pa.Table``)
under a name — the moral equivalent of ``Itorator.wrap``.
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register_stage(name: str, factory: Callable | None = None):
    """Register a stage factory: ``factory(**args)`` must return a batch UDF
    ``fn(pa.Table) -> pa.Table``.  Usable as a decorator."""
    def _inner(f):
        _REGISTRY[name] = f
        return f
    if factory is not None:
        _REGISTRY[name] = factory
        return factory
    return _inner


def registered_stages() -> list[str]:
    return sorted(_REGISTRY)


def build_pipeline(ds, spec: list[dict], batch_size: int | None = None):
    """Apply the spec's stages in order.  Each entry:
    ``{"stage": <registered name>, "args": {...},
       "concurrency": N | (lo, hi) | None}`` — a ``concurrency`` turns the
    step into an actor-pool stage (the factory is then expected to be a
    callable CLASS, constructed once per actor)."""
    for step in spec:
        name = step["stage"]
        if name not in _REGISTRY:
            raise ValueError(
                f"unknown stage {name!r}; registered: {registered_stages()}")
        factory = _REGISTRY[name]
        args = step.get("args", {})
        conc = step.get("concurrency")
        if conc is not None:
            ds = ds.map_batches(factory, fn_constructor_kwargs=args,
                                batch_format="pyarrow", batch_size=batch_size,
                                concurrency=conc)
        else:
            ds = ds.map_batches(factory(**args) if args or _wants_call(factory)
                                else factory,
                                batch_format="pyarrow", batch_size=batch_size)
    return ds


def _wants_call(factory) -> bool:
    """Stage factories that RETURN a UDF are called with their args; plain
    batch UDFs registered directly are used as-is."""
    return getattr(factory, "_is_factory", False)


def stage_factory(f):
    """Mark a registered callable as a factory returning the UDF."""
    f._is_factory = True
    return f


# ---------------------------------------------------------------------------
# built-in registrations
# ---------------------------------------------------------------------------

def _register_builtins() -> None:
    from pawpaw_ray.stages.arborform import make_arborform_batch
    from pawpaw_ray.stages.dedup import simhash_batch
    from pawpaw_ray.stages.ontology import (
        make_ontology_discover_batch,
        make_ontology_mentions_batch,
    )
    from pawpaw_ray.stages.segment import segment_batch, segment_sentences_batch
    from pawpaw_ray.stages.select import make_select_batch
    from pawpaw_ray.stages.tables import extract_tables_batch, filter_tool_turns
    from pawpaw_ray.stages.textstats import (
        fingerprint_batch,
        langid_batch,
        quality_batch,
        token_count_batch,
    )
    from pawpaw_ray.stages.triples import triples_batch

    register_stage("arborform", stage_factory(make_arborform_batch))
    register_stage("ontology_discover",
                   stage_factory(make_ontology_discover_batch))
    register_stage("ontology_mentions",
                   stage_factory(make_ontology_mentions_batch))
    register_stage("segment", segment_batch)
    register_stage("segment_sentences", segment_sentences_batch)
    register_stage("triples", triples_batch)
    register_stage("select", stage_factory(make_select_batch))
    register_stage("tables", extract_tables_batch)
    register_stage("filter_tool_turns", filter_tool_turns)
    register_stage("token_count", token_count_batch)
    register_stage("quality", quality_batch)
    register_stage("langid", langid_batch)
    register_stage("fingerprint", fingerprint_batch)
    register_stage("simhash", simhash_batch)


_register_builtins()
