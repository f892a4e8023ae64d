"""XmlHelper differential tests.

Oracle 1: stdlib ElementTree's namespace-aware view (Clark tags, resolved
attribute names, .text) must equal our span-side resolution for every
element of the reference suite's XML samples
(`/root/reference/tests/util.py:102-189`, sourced from public docs).
Oracle 2: the declarative expectations the reference's own
test_xml_helper.py asserts (prefix maps, default namespace, reverse_find,
`/root/reference/tests/test_xml_helper.py:28-116`).
"""

import xml.etree.ElementTree as ET

import pytest

from pawpaw_ray.kernels import xmlhelper as xh
from pawpaw_ray.kernels.xmlspans import parse_xml_spans

COUNTRY_XML = """<?xml version="1.0"?>
<data>
    <country name="Liechtenstein">
        <rank>1</rank>
        <year>2008</year>
        <gdppc>141100</gdppc>
        <neighbor name="Austria" direction="E"/>
        <neighbor name="Switzerland" direction="W"/>
    </country>
    <country name="Singapore">
        <rank>4</rank>
        <year>2011</year>
        <gdppc>59900</gdppc>
        <neighbor name="Malaysia" direction="N"/>
    </country>
</data>"""

ACTORS_XML = """<?xml version="1.0"?>
<actors xmlns:fictional="http://characters.example.com"
        xmlns="http://people.example.com">
    <actor>
        <name>John Cleese</name>
        <fictional:character>Lancelot</fictional:character>
        <fictional:character>Archie Leach</fictional:character>
    </actor>
    <actor>
        <name>Eric Idle</name>
        <fictional:character>Sir Robin</fictional:character>
        <fictional:character>Gunther</fictional:character>
    </actor>
</actors>"""

BOOKS_XML = '''
<h:html xmlns:xdc="http://www.xml.com/books"
        xmlns:h="http://www.w3.org/HTML/1998/html4">
 <h:head><h:title>Book Review</h:title></h:head>
 <h:body>
  <xdc:bookreview>
   <xdc:title>XML: A Primer</xdc:title>
   <h:table>
    <h:tr align="center">
     <h:td>Author</h:td><h:td>Price</h:td>
     <h:td>Pages</h:td><h:td>Date</h:td></h:tr>
    <h:tr align="left">
     <h:td><xdc:author>Simon St. Laurent</xdc:author></h:td>
     <h:td><xdc:price>31.98</xdc:price></h:td>
     <h:td><xdc:pages>352</xdc:pages></h:td>
     <h:td><xdc:date>1998/01</xdc:date></h:td>
    </h:tr>
   </h:table>
  </xdc:bookreview>
 </h:body>
</h:html>'''

# nested default-namespace override: exercises the ancestor walk
NESTED_NS_XML = ('<a xmlns="http://outer.example"><b xmlns="http://inner.example">'
                 '<c/></b><d/></a>')

# xmlns="" UN-declares the default namespace (XML-names spec §6.2)
UNDECLARE_NS_XML = ('<a xmlns="http://u.example"><b xmlns=""><c/></b>'
                    '<d/></a>')

SAMPLES = [COUNTRY_XML, ACTORS_XML, BOOKS_XML, NESTED_NS_XML,
           UNDECLARE_NS_XML]


@pytest.mark.parametrize("doc", SAMPLES)
def test_namespace_resolution_matches_elementtree(doc):
    """Per element, in document order: Clark tag, resolved attributes, and
    head text must equal stdlib ET's namespace-aware parse."""
    root = ET.fromstring(doc)
    theirs = [(e.tag, dict(e.attrib), e.text) for e in root.iter()]

    nodes = parse_xml_spans(doc, ignore_empties=False)
    els = xh.element_indices(nodes)
    ours = [(xh.resolve_tag(doc, nodes, i),
             xh.resolve_attributes(doc, nodes, i),
             xh.element_head_text(doc, nodes, i)) for i in els]
    assert ours == theirs and len(ours) > 3


def test_prefix_maps_reference_expectations():
    """The reference suite's declared prefix maps / default namespaces
    (tests/util.py:102-189) hold for our helper."""
    for doc, want_default, want_prefixes in [
        (COUNTRY_XML, None, {}),
        (ACTORS_XML, "{http://people.example.com}",
         {"fictional": "http://characters.example.com"}),
        (BOOKS_XML, None, {"xdc": "http://www.xml.com/books",
                           "h": "http://www.w3.org/HTML/1998/html4"}),
    ]:
        nodes = parse_xml_spans(doc)
        root = xh.element_indices(nodes)[0]
        assert xh.get_prefix_map(doc, nodes, root) == want_prefixes, doc[:30]
        assert xh.get_default_namespace(doc, nodes, root) == want_default

    # every depth sees the same default namespace via the ancestor walk
    nodes = parse_xml_spans(ACTORS_XML)
    for el in xh.element_indices(nodes):
        assert (xh.get_default_namespace(ACTORS_XML, nodes, el)
                == "{http://people.example.com}")

    # nested default override + fallthrough after the inner scope closes
    nodes = parse_xml_spans(NESTED_NS_XML)
    a, b, c, d = xh.element_indices(nodes)
    for el, want in [(a, "{http://outer.example}"),
                     (b, "{http://inner.example}"),
                     (c, "{http://inner.example}"),
                     (d, "{http://outer.example}")]:
        assert xh.get_default_namespace(NESTED_NS_XML, nodes, el) == want

    # un-declaration: inside xmlns="" the default namespace is None again
    nodes = parse_xml_spans(UNDECLARE_NS_XML)
    a, b, c, d = xh.element_indices(nodes)
    assert xh.get_default_namespace(UNDECLARE_NS_XML, nodes, a) \
        == "{http://u.example}"
    assert xh.get_default_namespace(UNDECLARE_NS_XML, nodes, b) is None
    assert xh.get_default_namespace(UNDECLARE_NS_XML, nodes, c) is None
    assert xh.resolve_tag(UNDECLARE_NS_XML, nodes, c) == "c"
    assert xh.resolve_tag(UNDECLARE_NS_XML, nodes, d) == "{http://u.example}d"


def test_qualified_name_and_clark_helpers():
    assert xh.qualified_name_from_src("a") == (None, "a")
    assert xh.qualified_name_from_src("a:b") == ("a", "b")
    assert xh.get_local_name("{http://x}tag") == "tag"
    assert xh.get_local_name("tag") == "tag"
    assert xh.get_namespace("{http://x}tag") == "{http://x}"
    assert xh.get_namespace("tag") is None

    nodes = parse_xml_spans(BOOKS_XML)
    root = xh.element_indices(nodes)[0]
    st = xh._start_tag_of(nodes, root)
    qn = xh.get_qualified_name(nodes, st)
    assert qn.fmt(BOOKS_XML) == "h:html"
    assert BOOKS_XML[slice(*qn.prefix)] == "h"
    assert BOOKS_XML[slice(*qn.local_part)] == "html"
    with pytest.raises(ValueError):
        xh.get_qualified_name(nodes, root)  # element, not start_tag/attr


def test_find_descendants_and_text_spans():
    nodes = parse_xml_spans(COUNTRY_XML)
    root = xh.element_indices(nodes)[0]
    years = list(xh.find_all_descendants_by_local_name(
        COUNTRY_XML, nodes, root, "year"))
    got = [COUNTRY_XML[nodes[t][0]:nodes[t][1]]
           for y in years for t in xh.get_text_spans(nodes, y)]
    assert got == ["2008", "2011"]
    assert xh.find_descendant_by_local_name(
        COUNTRY_XML, nodes, root, "nothere") is None

    # scoped search: descendants of the SECOND country only
    second = xh.find_all_descendants_by_local_name(
        COUNTRY_XML, nodes, root, "country")
    c2 = list(second)[1]
    inner = list(xh.find_all_descendants_by_local_name(
        COUNTRY_XML, nodes, c2, "neighbor"))
    assert len(inner) == 1


def test_reverse_find_reference_cases():
    """The reference suite's reverse_find scenarios
    (tests/util.py:109,142,167)."""
    # gdppc → ancestor with child 'rank'
    nodes = parse_xml_spans(COUNTRY_XML)
    root = xh.element_indices(nodes)[0]
    gdppc = xh.find_descendant_by_local_name(COUNTRY_XML, nodes, root, "gdppc")
    anc = xh.reverse_find(COUNTRY_XML, nodes, gdppc, "rank")
    assert anc is not None
    assert xh.resolve_tag(COUNTRY_XML, nodes, anc) == "country"

    # character → ancestor with child {people}actor... (Clark child test)
    nodes = parse_xml_spans(ACTORS_XML)
    root = xh.element_indices(nodes)[0]
    ch = xh.find_descendant_by_local_name(ACTORS_XML, nodes, root, "character")
    anc = xh.reverse_find(ACTORS_XML, nodes, ch,
                          "{http://people.example.com}name")
    assert anc is not None
    assert xh.resolve_tag(ACTORS_XML, nodes, anc) \
        == "{http://people.example.com}actor"

    # date → ancestor with @align attribute
    nodes = parse_xml_spans(BOOKS_XML)
    root = xh.element_indices(nodes)[0]
    date = xh.find_descendant_by_local_name(BOOKS_XML, nodes, root, "date")
    anc = xh.reverse_find(BOOKS_XML, nodes, date, "@align")
    assert anc is not None
    assert xh.resolve_attributes(BOOKS_XML, nodes, anc)["align"] == "left"

    # no match walks off the root
    assert xh.reverse_find(BOOKS_XML, nodes, date, "@nope") is None

    # callable predicate
    assert xh.reverse_find(
        BOOKS_XML, nodes, date,
        lambda i: xh.resolve_tag(BOOKS_XML, nodes, i).endswith("bookreview")
    ) is not None


def test_parent_element_chain():
    nodes = parse_xml_spans(COUNTRY_XML)
    els = xh.element_indices(nodes)
    root = els[0]
    assert xh.parent_element(nodes, root) is None
    rank = xh.find_descendant_by_local_name(COUNTRY_XML, nodes, root, "rank")
    country = xh.parent_element(nodes, rank)
    assert xh.resolve_tag(COUNTRY_XML, nodes, country) == "country"
    assert xh.parent_element(nodes, country) == root
