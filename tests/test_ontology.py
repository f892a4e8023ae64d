"""Differential tests: kernels/ontology.py vs the reference Ontology
(`/root/reference/pawpaw/ontology/ontology.py`, test suite
`/root/reference/tests/ontology/test_ontology.py`) on the vehicle concept
tree, plus spec compilation and the Dataset-level mention stage."""

import regex as rx

from pawpaw_ray.kernels.arborform import ANode, register_itor_fn
from pawpaw_ray.kernels.ontology import (
    Discoveries,
    Ontology,
    build_ontology,
    discoveries_to_rows,
)

# identical pattern strings feed both engines (the reference test's
# \L<subtypes> list is pre-expanded so the sides are literally equal)
MUSTANG_RE = (r"(?P<Mustang>(?:Ford\s+)?Mustang(?:(?:-|\s+)"
              r"(?:EcoBoost|LX|GT350|GT500|GT|Mach\-E|Dark\s+Horse))?)")
F_SERIES_RE = r"(?P<F_Series>F(?:ord)?-(?:150(?:\s+Lightning)?|[3-7]50|600))"
SKYHAWK_RE = (r"(?P<Skyhawk>Cessna\s+172(?:\s+Skyhawk)?"
              r"|(?:Cessna\s+)?172\s+Skyhawk)")
CARAVAN_RE = (r"(?P<Caravan>Cessna\s+208(?:\s+Caravan)?"
              r"|(?:Cessna\s+)?208\s+Caravan)")
VEHICLE_RE = r"(?P<vehicle>vehicles?)"

TEXTS = [
    "The vehicle John loves to drive most is his F-150, not his Cessna 172.",
    "Two vehicles: a Mustang GT500 and a 172 Skyhawk, plus one Cessna 208.",
    "Ford Mustang Mach-E outsells the F-350; no airplanes here.",
    "nothing relevant at all",
]

ONT_SPEC = {
    "children": {
        "vehicle": {
            "rules": [{"itor": "extract", "re": VEHICLE_RE,
                       "ignorecase": True}],
            "children": {
                "car": {
                    "children": {
                        "Ford": {"rules": [
                            {"itor": "extract", "re": MUSTANG_RE,
                             "ignorecase": True},
                            {"itor": "extract", "re": F_SERIES_RE,
                             "ignorecase": True},
                        ]},
                    },
                },
                "airplane": {
                    "children": {
                        "Cessna": {"rules": [
                            {"itor": "extract", "re": SKYHAWK_RE,
                             "ignorecase": True},
                            {"itor": "extract", "re": CARAVAN_RE,
                             "ignorecase": True},
                        ]},
                    },
                },
            },
        },
    },
}


def _ref_ontology(pp):
    from pawpaw.ontology import Ontology as ont
    ex = pp.arborform.Extract
    flags = rx.IGNORECASE | rx.DOTALL
    return ont({
        "vehicle": ont(
            {
                "car": ont({"Ford": ont(rules=[
                    ex(rx.compile(MUSTANG_RE, flags)),
                    ex(rx.compile(F_SERIES_RE, flags)),
                ])}),
                "airplane": ont({"Cessna": ont(rules=[
                    ex(rx.compile(SKYHAWK_RE, flags)),
                    ex(rx.compile(CARAVAN_RE, flags)),
                ])}),
            },
            rules=[ex(rx.compile(VEHICLE_RE, flags))],
        )
    })


def _ref_flat(pp, ont, text):
    ref_disc = ont.discover(pp.Ito(text))
    return {path: [(i.start, i.stop) for i in itos]
            for path, itos in ref_disc.flatten().items()}


def test_discover_parity(pawpaw_ref):
    """Full-tree discover parity: same paths, same spans, every fixture."""
    pp = pawpaw_ref
    theirs_ont = _ref_ontology(pp)
    ours_ont = build_ontology(ONT_SPEC)
    for text in TEXTS:
        theirs = _ref_flat(pp, theirs_ont, text)
        disc = ours_ont.discover_text(text)
        ours = {path: [(n.start, n.stop) for n in nodes]
                for path, nodes in disc.flatten().items()}
        assert ours == theirs, text
    # non-trivial on at least one fixture
    assert _ref_flat(pp, theirs_ont, TEXTS[0])


def test_path_index_access():
    ont = build_ontology(ONT_SPEC)
    assert ont["vehicle", "car", "Ford"] is ont["vehicle"]["car"]["Ford"]
    assert ont[("vehicle", "airplane")] is ont["vehicle"]["airplane"]
    disc = ont.discover_text(TEXTS[1])
    assert disc["vehicle", "car", "Ford"].nodes
    assert [*disc.walk()]


def test_flatten_empties_and_walk(pawpaw_ref):
    pp = pawpaw_ref
    ours = build_ontology(ONT_SPEC).discover_text(TEXTS[0])
    theirs = _ref_ontology(pp).discover(pp.Ito(TEXTS[0]))
    # filter_empties=False keeps every path incl. the root (ontology.py:23-27)
    ours_all = set(ours.flatten(filter_empties=False))
    theirs_all = set(theirs.flatten(filter_empties=False))
    assert ours_all == theirs_all and tuple() in ours_all
    assert len([*ours.walk()]) == len([*theirs.walk()])


def test_rule_callables():
    """Arbitrary user callables as rules — the reference's C_ORULE surface."""
    def shouty(text, node):
        for m in rx.finditer(r"\b[A-Z]{3,}\b", text, pos=node.start,
                             endpos=node.stop):
            yield ANode(m.start(), m.end(), "shout")

    register_itor_fn("shouty_words", shouty)
    ont = Ontology({"style": Ontology(rules=[shouty])})
    spec_ont = build_ontology({"children": {"style": {
        "rules": [{"itor": "func", "name": "shouty_words"}]}}})
    text = "this is FINE but THAT was LOUD"
    want = [("style", 8, 12), ("style", 17, 21), ("style", 26, 30)]
    assert discoveries_to_rows(ont.discover_text(text)) == want
    assert discoveries_to_rows(spec_ont.discover_text(text)) == want


def test_discoveries_ctor_kwargs():
    d = Discoveries({"a": Discoveries()}, nodes=[ANode(0, 3)])
    assert [n.start for n in d.nodes] == [0] and list(d) == ["a"]


def test_ontology_mentions_stage(ray_session):
    """Dataset-level exploded mention table equals per-row kernel output."""
    import ray.data as rd

    from pawpaw_ray.pipelines.spec import build_pipeline

    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)])
    out = build_pipeline(ds, [{
        "stage": "ontology_mentions",
        "args": {"ontology": ONT_SPEC},
    }])
    rows = sorted(((r["doc_id"], r["path"], r["start"], r["stop"],
                    r["surface"]) for r in out.take_all()))

    ont = build_ontology(ONT_SPEC)
    want = sorted(
        (i, p, s, e, t[s:e])
        for i, t in enumerate(TEXTS) if t
        for p, s, e in discoveries_to_rows(ont.discover_text(t)))
    assert rows == want and len(rows) >= 8
