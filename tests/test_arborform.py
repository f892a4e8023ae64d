"""Differential tests: the arborform connector-DAG interpreter
(kernels/arborform.py) vs the reference arborform engine on identical
pipelines — per-connector grid, the us_constitution demo parser
(`/root/reference/docs/demos/us_constitution/us_constitution.py:16-55`),
SimpleNlp-as-DAG, and pipeline-reachable postorators."""

import regex as rx

from pawpaw_ray.kernels.arborform import (
    ANode,
    Desc,
    Extract,
    Filter,
    Func,
    Itor,
    Nuco,
    Reflect,
    Split,
    build_itor,
    flatten_tree,
    register_itor_fn,
    register_predicate,
    run_pipeline,
    simple_nlp_itor,
)
from pawpaw_ray.kernels.spans import Retention, strip_span


def _flat_ref(itos):
    out = []

    def walk(ito, parent):
        idx = len(out)
        out.append((ito.start, ito.stop, ito.desc, parent))
        for c in ito.children:
            walk(c, idx)

    for i in itos:
        walk(i, -1)
    return out


def _flat_ours(nodes):
    out = []

    def walk(n, parent):
        idx = len(out)
        out.append((n.start, n.stop, n.desc, parent))
        for c in n.children:
            walk(c, idx)

    for n in nodes:
        walk(n, -1)
    return out


def _strip_itor(chars):
    return Func(lambda text, node, c=chars: [
        ANode(*strip_span(text, (node.start, node.stop), c), node.desc)])


def test_delegate_yield_break(pawpaw_ref):
    pp = pawpaw_ref
    s = "123a321"

    w1 = pp.arborform.Itorator.wrap(lambda ito: [ito.str_strip("1")])
    w2 = pp.arborform.Itorator.wrap(lambda ito: [ito.str_strip("2")])
    w3 = pp.arborform.Itorator.wrap(lambda ito: [ito.str_strip("3")])
    w1.connections.append(pp.arborform.Connectors.Delegate(w2))
    w1.connections.append(pp.arborform.Connectors.Delegate(w3))
    theirs = _flat_ref(w1(pp.Ito(s)))

    o1, o2, o3 = _strip_itor("1"), _strip_itor("2"), _strip_itor("3")
    o1.connect("delegate", o2).connect("delegate", o3)
    ours = _flat_ours(o1(s, ANode(0, len(s))))
    assert ours == theirs  # first delegate wins; second never fires


def test_recurse_chains(pawpaw_ref):
    pp = pawpaw_ref
    s = "123a321"

    w1 = pp.arborform.Itorator.wrap(lambda ito: [ito.str_strip("1")])
    w2 = pp.arborform.Itorator.wrap(lambda ito: [ito.str_strip("2")])
    w3 = pp.arborform.Itorator.wrap(lambda ito: [ito.str_strip("3")])
    w1.connections.append(pp.arborform.Connectors.Recurse(w2))
    w1.connections.append(pp.arborform.Connectors.Recurse(w3))
    theirs = _flat_ref(w1(pp.Ito(s)))

    o1, o2, o3 = _strip_itor("1"), _strip_itor("2"), _strip_itor("3")
    o1.connect("recurse", o2).connect("recurse", o3)
    ours = _flat_ours(o1(s, ANode(0, len(s))))
    assert ours == theirs  # both recurse steps apply: fully stripped


def test_subroutine_and_predicates(pawpaw_ref):
    pp = pawpaw_ref
    s = "one two three"

    word_re = rx.compile(r"(?P<word>\w+)")
    ref_words = pp.arborform.Extract(word_re)
    ref_mark = pp.arborform.Desc("marked")
    ref_words.connections.append(
        pp.arborform.Connectors.Subroutine(ref_mark, lambda i: str(i) == "two"))
    theirs = _flat_ref(ref_words(pp.Ito(s)))

    words = Extract(word_re)
    words.connect("subroutine", Desc("marked"),
                  lambda node, text: text[node.start:node.stop] == "two")
    ours = _flat_ours(words(s, ANode(0, len(s))))
    assert ours == theirs
    assert ("word" in {d for _, _, d, _ in ours}
            and "marked" in {d for _, _, d, _ in ours})


def test_children_add_replace_delete(pawpaw_ref):
    pp = pawpaw_ref
    s = "aa bb cc"
    word_re = rx.compile(r"(?P<word>\w+)")
    char_re = rx.compile(r"(?P<char>\w)")

    for kind, ref_cls in [
        ("children_add", pp.arborform.Connectors.Children.Add),
        ("children_replace", pp.arborform.Connectors.Children.Replace),
    ]:
        ref_root = pp.arborform.Reflect()
        ref_words = pp.arborform.Extract(word_re)
        ref_root.connections.append(
            pp.arborform.Connectors.Children.Add(ref_words))
        ref_chars = pp.arborform.Extract(char_re)
        ref_root.connections.append(ref_cls(ref_chars))
        try:
            theirs = _flat_ref(ref_root(pp.Ito(s)))
            raised_ref = None
        except ValueError as e:
            raised_ref = e

        root = Reflect()
        root.connect("children_add", Extract(word_re))
        root.connect(kind, Extract(char_re))
        try:
            ours = _flat_ours(root(s, ANode(0, len(s))))
            raised_ours = None
        except ValueError as e:
            raised_ours = e
        # children_add of overlapping chars after words raises in BOTH
        assert (raised_ref is None) == (raised_ours is None), kind
        if raised_ref is None:
            assert ours == theirs, kind

    # delete: requires OBJECT identity (ito.py:1483-1488) — the sub-itor
    # yields the actual children to remove
    ref_root = pp.arborform.Reflect()
    ref_words = pp.arborform.Extract(word_re)
    ref_root.connections.append(pp.arborform.Connectors.Children.Add(ref_words))
    ref_bb = pp.arborform.Itorator.wrap(
        lambda ito: [c for c in ito.children if str(c) == "bb"])
    ref_root.connections.append(pp.arborform.Connectors.Children.Delete(ref_bb))
    theirs = _flat_ref(ref_root(pp.Ito(s)))

    root = Reflect()
    root.connect("children_add", Extract(word_re))
    root.connect("children_delete", Func(
        lambda text, node: [c for c in node.children
                            if text[c.start:c.stop] == "bb"]))
    ours = _flat_ours(root(s, ANode(0, len(s))))
    assert ours == theirs
    assert (3, 5, "word", 0) not in ours


def test_children_add_hierarchical(pawpaw_ref):
    pp = pawpaw_ref
    s = "abc def"
    outer_re = rx.compile(r"(?P<outer>\w+)")
    inner_re = rx.compile(r"(?P<inner>\w)")

    ref_root = pp.arborform.Reflect()
    ref_root.connections.append(pp.arborform.Connectors.Children.Add(
        pp.arborform.Extract(inner_re)))
    ref_root.connections.append(
        pp.arborform.Connectors.Children.AddHierarchical(
            pp.arborform.Extract(outer_re)))
    theirs = _flat_ref(ref_root(pp.Ito(s)))

    root = Reflect()
    root.connect("children_add", Extract(inner_re))
    root.connect("children_add_hierarchical", Extract(outer_re))
    ours = _flat_ours(root(s, ANode(0, len(s))))
    assert ours == theirs  # words adopt the pre-existing char children


def test_nuco_and_filter(pawpaw_ref):
    pp = pawpaw_ref
    s = "   xyz"
    num_re = rx.compile(r"(?P<number>\d+)")
    word_re = rx.compile(r"(?P<word>[a-z]+)")

    ref = pp.arborform.Nuco(pp.arborform.Extract(num_re),
                            pp.arborform.Extract(word_re))
    theirs = _flat_ref(ref(pp.Ito(s)))
    ours = _flat_ours(
        Nuco(Extract(num_re), Extract(word_re))(s, ANode(0, len(s))))
    assert ours == theirs  # no numbers → word branch wins

    ref_f = pp.arborform.Extract(word_re)
    ref_f.connections.append(pp.arborform.Connectors.Delegate(
        pp.arborform.Filter(lambda i: len(i) > 2)))
    theirs = _flat_ref(ref_f(pp.Ito(s)))
    f = Extract(word_re)
    f.connect("delegate", Filter(lambda node, text: node.stop - node.start > 2))
    ours = _flat_ours(f(s, ANode(0, len(s))))
    assert ours == theirs


def _ref_us_constitution_parser(pp):
    """Reference parser, constructed exactly as the demo does
    (us_constitution.py:16-55)."""
    arborform = pp.arborform
    a_splitter = arborform.Split(
        rx.compile(r"(?<=\n+)(?=Article\.)", rx.DOTALL),
        boundary_retention=arborform.Split.BoundaryRetention.NONE)
    a_desc = arborform.Desc(desc=lambda ito: "article"
                            if ito.str_startswith("Article.") else "preamble")
    a_splitter.connections.append(arborform.Connectors.Delegate(a_desc))
    a_desc.connections.append(arborform.Connectors.Children.Add(
        pp.nlp.SimpleNlp().itor, lambda ito: ito.desc == "preamble"))
    a_extractor = arborform.Extract(
        rx.compile(r"Article\. (?<key>[A-Z]+)\.\n(?<value>.+)", rx.DOTALL))
    a_desc.connections.append(arborform.Connectors.Children.Add(
        a_extractor, lambda ito: ito.desc == "article"))
    s_splitter = arborform.Split(
        rx.compile(r"(?<=\n+)(?=Section\.)", rx.DOTALL),
        boundary_retention=arborform.Split.BoundaryRetention.LEADING,
        desc="section")
    a_extractor.connections.append(arborform.Connectors.Children.Add(
        s_splitter,
        lambda ito: ito.desc == "value" and ito.str_startswith("Section.")))
    a_extractor.connections.append(arborform.Connectors.Children.Add(
        pp.nlp.SimpleNlp().itor,
        lambda ito: ito.desc == "value" and not ito.str_startswith("Section.")))
    s_extractor = arborform.Extract(
        rx.compile(r"Section\. (?<key>\d+)\.\n(?<value>.+)", rx.DOTALL))
    s_splitter.connections.append(arborform.Connectors.Children.Add(s_extractor))
    s_extractor.connections.append(arborform.Connectors.Children.Add(
        pp.nlp.SimpleNlp().itor, lambda ito: ito.desc == "value"))
    return a_splitter


register_itor_fn(
    "article_or_preamble",
    None)  # replaced below — registration exercised via build_itor


def _desc_article_or_preamble(text, node):
    return ("article"
            if text.startswith("Article.", node.start, node.stop)
            else "preamble")


register_itor_fn("article_or_preamble", _desc_article_or_preamble)

US_CONSTITUTION_SPEC = {
    "itor": "split", "re": r"(?<=\n+)(?=Article\.)", "retention": "none",
    "connections": [{
        "connector": "delegate",
        "itor": {
            "itor": "desc", "fn": "article_or_preamble",
            "connections": [
                {"connector": "children_add",
                 "predicate": "preamble",
                 "itor": {"itor": "simple_nlp"}},
                {"connector": "children_add",
                 "predicate": "article",
                 "itor": {
                     "itor": "extract",
                     "re": r"Article\. (?<key>[A-Z]+)\.\n(?<value>.+)",
                     "connections": [
                         {"connector": "children_add",
                          "predicate": {"all": [{"desc": "value"},
                                                {"startswith": "Section."}]},
                          "itor": {
                              "itor": "split",
                              "re": r"(?<=\n+)(?=Section\.)",
                              "retention": "leading", "desc": "section",
                              "connections": [
                                  {"connector": "children_add",
                                   "itor": {
                                       "itor": "extract",
                                       "re": r"Section\. (?<key>\d+)\.\n(?<value>.+)",
                                       "connections": [
                                           {"connector": "children_add",
                                            "predicate": "value",
                                            "itor": {"itor": "simple_nlp"}}],
                                   }}],
                          }},
                         {"connector": "children_add",
                          "predicate": {"all": [
                              {"desc": "value"},
                              {"not": {"startswith": "Section."}}]},
                          "itor": {"itor": "simple_nlp"}},
                     ]}},
            ]}}],
}


def test_us_constitution_demo_parity(pawpaw_ref):
    """The demo parser expressed as a data spec reproduces the reference's
    tree AND its section/word plumule query results on the real document."""
    pp = pawpaw_ref
    text = open("/root/reference/docs/demos/us_constitution/"
                "us_constitution.txt").read()

    root_ref = pp.Ito(text, desc="constitution")
    root_ref.children.add(*_ref_us_constitution_parser(pp)(root_ref))
    theirs = _flat_ref([root_ref])

    itor = build_itor(US_CONSTITUTION_SPEC)
    root = run_pipeline(text, itor, root_desc="constitution")
    ours = _flat_ours([root])
    assert len(ours) == len(theirs)
    assert ours == theirs

    # end-to-end query parity (the demo's goal: sections mentioning
    # power/right, us_constitution.py:74-77)
    from pawpaw_ray.kernels.query import Query, TreeView

    query = "**[d:section]{**[d:word] & [lcs:power,right]}"
    starts, stops, descs, parents = flatten_tree([root])
    tree = TreeView(text, starts, stops, descs, parents)
    ours_q = [(starts[n], stops[n]) for n in Query(query).find_all(tree)]
    theirs_q = [(i.start, i.stop) for i in pp.query.find_all(query, root_ref)]
    assert ours_q == theirs_q and len(ours_q) > 5


def test_simple_nlp_dag_matches_segment_text():
    """The SimpleNlp cascade built from interpreter primitives must equal
    the fused segment_text kernel (which is itself reference-parity-tested)."""
    from pawpaw_ray.kernels.nlp import DESC_VOCAB, segment_text

    texts = [
        "Mary spake. Then John went home.\n\nHe said 1,234.56 twice. "
        "What else?\n\nDr. Smith met Capt. Jones at 3.5 p.m. They left.",
        "One.\n\nTwo sentences here. Plus 42 now.",
        "",
    ]
    itor = simple_nlp_itor()
    for text in texts:
        if text:
            root = run_pipeline(text, itor)
            ours = flatten_tree([root])
            s, e, d, p = segment_text(text)
            want = (list(s), list(e), [DESC_VOCAB[x] for x in d], list(p))
            got = (list(ours[0]), list(ours[1]), list(ours[2]), list(ours[3]))
            assert got == want, text[:30]


def test_postorator_reachable_from_spec(pawpaw_ref):
    """A windowed-join postorator attached via the pipeline spec matches the
    reference postorator bound to the same itorator."""
    pp = pawpaw_ref
    s = "a b c d e"
    word_re = rx.compile(r"(?P<word>\w+)")

    ref = pp.arborform.Extract(word_re)
    ref.postorator = pp.arborform.postorator.WindowedJoin(
        2, lambda itos: True, desc="pair")
    theirs = _flat_ref(ref(pp.Ito(s)))

    register_predicate("always_join", lambda window, text: True)
    spec = {"itor": "extract", "re": r"(?P<word>\w+)",
            "postorator": {"kind": "windowed_join", "window_size": 2,
                           "predicate": {"fn": "always_join"}, "desc": "pair"}}
    ours = _flat_ours(build_itor(spec)(s, ANode(0, len(s))))
    assert ours == theirs
    assert all(d == "pair" for _, _, d, _ in ours[:-1])


def test_arborform_stage_in_spec_pipeline(ray_session):
    """The DAG is usable as a pipeline-as-data step: `build_pipeline` with an
    `arborform` stage over a Dataset emits the same span trees as running the
    compiled itor per row on the driver."""
    import ray.data as rd

    from pawpaw_ray.pipelines.spec import build_pipeline

    texts = [
        "Mary spake. Then John went home.\n\nHe said 1,234.56 twice.",
        "One.\n\nTwo sentences here. Plus 42 now.",
        "",
    ]
    pipeline = {"itor": "simple_nlp"}
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    out = build_pipeline(ds, [{
        "stage": "arborform",
        "args": {"pipeline": pipeline, "root_desc": "Document"},
    }])
    rows = sorted(out.take_all(), key=lambda r: r["doc_id"])

    itor = build_itor(pipeline)
    for row, text in zip(rows, texts):
        if not text:
            assert row["spans"] == []
            continue
        s, e, d, p = flatten_tree([run_pipeline(text, itor)])
        got = [(sp["start"], sp["stop"], sp["desc"], sp["parent"])
               for sp in row["spans"]]
        assert got == list(zip(s, e, d, p))
        assert got[0] == (0, len(text), "Document", -1)
