"""Property-based differential tests (hypothesis): random text through our
kernels must match the reference executing the same rules — the randomized
analog of the reference's RandSpans/RandSubstrings strategy
(`/root/reference/pawpaw/tests/util.py:35-79`)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pawpaw_ray.kernels.nlp import PARAGRAPH_RE, SENTENCE_RE
from pawpaw_ray.kernels.spans import Retention, split_by_boundaries, split_spans

# text with sentence-ish structure: words, punctuation, quotes, newlines,
# numbers, abbreviations
_tokens = st.sampled_from(
    ["Hello", "world", "Dr.", "Smith", "met", "Capt.", "Jones", "e.g.",
     "U.S.", "Government", "1,234.56", "3.5", "x", "He", "said", "What",
     "The", "there", '"quoted"', "(aside)", "item-4", "end"])
_seps = st.sampled_from([" ", " ", " ", ". ", "! ", "? ", "... ", "\n",
                         "\n\n", ".\n\n", "  ", ".  "])
random_text = st.lists(
    st.tuples(_tokens, _seps), min_size=0, max_size=60
).map(lambda ps: "".join(t + s for t, s in ps))


@settings(max_examples=150, deadline=None)
@given(random_text)
def test_sentence_segmentation_parity(pawpaw_ref, text):
    """Paragraph→Sentence boundaries match the reference itorators."""
    pp = pawpaw_ref
    para = pp.nlp.Paragraph().get_itor()
    sent = pp.nlp.Sentence().get_itor()
    para.connections.append(pp.arborform.Connectors.Delegate(sent))
    theirs = [tuple(i.span) for i in para(pp.Ito(text))]

    ours = []
    for p in split_spans(text, (0, len(text)), PARAGRAPH_RE):
        ours.extend(split_spans(text, p, SENTENCE_RE))
    assert ours == theirs


@settings(max_examples=100, deadline=None)
@given(random_text, st.sampled_from(list(Retention)),
       st.sampled_from([None, 1, 2]))
def test_split_retention_parity(pawpaw_ref, text, retention, limit):
    """Split with every BoundaryRetention mode matches arborform.Split."""
    import regex as rx

    pp = pawpaw_ref
    pat = rx.compile(r"\s+")
    ref_mode = getattr(pp.arborform.Split.BoundaryRetention, retention.name)
    kw = {"limit": limit} if limit is not None else {}
    splitter = pp.arborform.Split(pat, boundary_retention=ref_mode, **kw)
    theirs = [tuple(i.span) for i in splitter(pp.Ito(text))]

    bounds = [m.span() for m in pat.finditer(text)]
    ours = [s for s, _ in split_by_boundaries(
        (0, len(text)), bounds, retention,
        return_zero_split=True, limit=limit)]
    assert ours == theirs


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="ab \n.", min_size=0, max_size=40))
def test_gaps_parity(pawpaw_ref, text):
    """from_gaps over word matches equals the reference's negative space."""
    import regex as rx

    pp = pawpaw_ref
    from pawpaw_ray.kernels.spans import gaps

    pat = rx.compile(r"\w+")
    non_gaps = [m.span() for m in pat.finditer(text)]
    itos = [pp.Ito(text, s, e) for s, e in non_gaps]
    theirs = [tuple(i.span) for i in pp.Ito.from_gaps(text, itos)]
    ours = gaps((0, len(text)), non_gaps)
    assert ours == theirs
