"""Demo ontology over the synthetic ``documents`` vocabulary.

One source of truth for the driver query (``__ray_entry__._q_ontology``)
and its golden oracle (``scripts/make_golden.py:golden_ontology``): both
sides compile the SAME pattern strings, ours through
:func:`pawpaw_ray.kernels.ontology.build_ontology`, the oracle through the
reference ``pawpaw.ontology.Ontology`` with ``arborform.Extract`` rules
(``/root/reference/pawpaw/ontology/ontology.py:60-70``).
"""

from __future__ import annotations

# concept path -> rule pattern strings (named group = surface span)
DEMO_RULES: dict[tuple[str, ...], list[str]] = {
    ("ops",): [r"\b(?P<op>(?:scan|sort|merge|join|filter)s?)\b"],
    ("ops", "aggregate"): [r"\b(?P<agg>agg|group(?:s|ing)?)\b"],
    ("ops", "window"): [r"\b(?P<win>windows?)\b"],
    ("storage", "table"): [r"\b(?P<table>tables?|rows?|columns?)\b"],
    ("storage", "stream"): [r"\b(?P<stream>streams?|batch(?:es)?)\b"],
    ("perf",): [r"\b(?P<speed>fast|slow|big|small)\b"],
}


def demo_ontology_spec() -> dict:
    """The plain-data spec form (``build_ontology`` input)."""
    root: dict = {"children": {}}
    for path, patterns in DEMO_RULES.items():
        node = root
        for part in path:
            node = node.setdefault("children", {}).setdefault(part, {})
        node["rules"] = [{"itor": "extract", "re": p, "ignorecase": True}
                         for p in patterns]
    return root
