"""Differential: our expat span extractor vs the reference's XmlParser on
identical documents — multiset of (desc, start, stop) must agree for the
shared desc vocabulary."""

import pytest

from pawpaw_ray.kernels.xmlspans import parse_xml_spans

SAMPLES = [
    # namespaced, attributes, nested text
    ('<music xmlns="http://www.w3.org/2021/music" '
     'xmlns:mus="http://www.w3.org/2021/mus">\n'
     '  <mus:album mus:genre="rock" year="1969">\n'
     '    <title>Abbey Road</title>\n'
     '    <artist>The Beatles</artist>\n'
     '  </mus:album>\n'
     '</music>'),
    # comments and PI inside text regions
    ('<root>\n'
     '  leading text <!-- a comment --> middle <?proc do-it?> trailing\n'
     '  <child attr="v">inner</child>\n'
     '</root>'),
    # deep nesting, repeated tags
    ('<a><b><c>x</c><c>y</c></b><b>z</b></a>'),
]

DESCS = ["element", "start_tag", "end_tag", "tag", "namespace", "name",
         "attribute", "value", "text", "comment", "pi"]


def _flatten_ref(ito, acc=None):
    if acc is None:
        acc = []
    acc.append((ito.desc, ito.start, ito.stop))
    for c in ito.children:
        _flatten_ref(c, acc)
    return acc


_REF_RUNNER = r"""
import json, sys
sys.modules['_elementtree'] = None  # reference hooks need the pure-Python ET
sys.path.insert(0, '/root/reference')
import xml.etree.ElementTree as ET
from pawpaw import xml as pxml

def flatten(ito, acc):
    acc.append((ito.desc, ito.start, ito.stop))
    for c in ito.children:
        flatten(c, acc)
    return acc

doc = sys.stdin.read()
root = ET.fromstring(doc, parser=pxml.XmlParser())
print(json.dumps(flatten(root.ito, [])))
"""


def _reference_spans(doc: str):
    import json
    import subprocess
    import sys

    out = subprocess.run([sys.executable, "-c", _REF_RUNNER], input=doc,
                         capture_output=True, text=True, check=True).stdout
    return [tuple(x) for x in json.loads(out)]


@pytest.mark.parametrize("doc", SAMPLES)
def test_xml_span_parity(doc):
    # reference runs in a subprocess: its expat hooks require the
    # pure-Python ElementTree, selectable only before ET is first imported
    theirs = _reference_spans(doc)
    ours = [(d, s, e) for s, e, d, _ in parse_xml_spans(doc)]

    for desc in DESCS:
        t = sorted(x for x in theirs if x[0] == desc)
        o = sorted(x for x in ours if x[0] == desc)
        assert o == t, f"desc {desc!r}: ours {o} != theirs {t}"


def test_xml_tree_structure():
    nodes = parse_xml_spans("<a><b k=\"1\">hi</b></a>")
    descs = [d for _, _, d, _ in nodes]
    assert descs[0] == "element"
    by_desc = {}
    for s, e, d, p in nodes:
        by_desc.setdefault(d, []).append((s, e, p))
    # b's element node is a child of a's element node
    a_el = 0
    b_el = next(i for i, n in enumerate(nodes)
                if n[2] == "element" and n[0] != 0)
    assert nodes[b_el][3] == a_el
    # attribute under the start tag chain, value under attribute
    attr_idx = next(i for i, n in enumerate(nodes) if n[2] == "attribute")
    val = next(n for n in nodes if n[2] == "value")
    assert val[3] == attr_idx


def test_xml_self_closing():
    nodes = parse_xml_spans('<a><b/><c x="1"/></a>')
    els = [(s, e) for s, e, d, _ in nodes if d == "element"]
    assert (3, 7) in els   # <b/>
    assert not [d for _, _, d, _ in nodes if d == "end_tag" and _ != 0] or True
    # self-closing elements emit no end_tag
    b_children = [n for n in nodes if n[3] == next(
        i for i, n2 in enumerate(nodes) if n2[:2] == (3, 7))]
    assert all(d != "end_tag" for _, _, d, _ in b_children)
