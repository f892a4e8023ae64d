"""Golden + differential tests of the NLP segmentation kernels.

Golden sentence cases mirror the reference's linguistic scenarios
(/root/reference/tests/nlp/test_nlp.py:60-194); the differential tests run
the reference SimpleNlp on the same texts and assert identical span trees.
"""

import pytest
import regex as rx

from pawpaw_ray.kernels import nlp
from pawpaw_ray.kernels.nlp import (
    DESC_VOCAB,
    NUMBER_RE,
    SENTENCE_RE,
    number_value,
    segment_text,
)
from pawpaw_ray.kernels.spans import split_spans


SENTENCE_GOLDENS = [
    ("EOF", "Yes.", ["Yes."]),
    ("two whitespace", "The king was John I.  Henry was his son.",
     ["The king was John I.", "Henry was his son."]),
    ("full stop", "Mary spake. Then John", ["Mary spake.", "Then John"]),
    ("question mark", "What day is it? Tuesday.", ["What day is it?", "Tuesday."]),
    ("exclamation", "Wait! I want to come.", ["Wait!", "I want to come."]),
    ("multi delimiters", "Wait... how can that be?!? Tell me!! Why is this so hard!?!",
     ["Wait... how can that be?!?", "Tell me!!", "Why is this so hard!?!"]),
    ("starts with number", "He lived a long life. 100 years approximately.",
     ["He lived a long life.", "100 years approximately."]),
    ("numeric abbr", "Hippocrates was born c. 460 bce.  See pp. 431 in your history book for details.",
     ["Hippocrates was born c. 460 bce.", "See pp. 431 in your history book for details."]),
    ("decimals", "The plane landed 1.5 south of the airport; approximately 32.2540° N, 110.9742°.",
     ["The plane landed 1.5 south of the airport; approximately 32.2540° N, 110.9742°."]),
    ("urls", "https://github.com/rlayers/pawpaw is home to interesting software.",
     ["https://github.com/rlayers/pawpaw is home to interesting software."]),
    ("mid-sentence abbr", "Jane et. al. worked for Smith & Co. last year.",
     ["Jane et. al. worked for Smith & Co. last year."]),
    ("possessive abbr", "Martin Luther King Jr.'s legacy endures.",
     ["Martin Luther King Jr.'s legacy endures."]),
    ("exclusion abbrs",
     "Dr. Francis, brother of Prof.\nMustard, and Brig. Gen. Adams hiked together near Mt. Rainer.",
     ["Dr. Francis, brother of Prof.\nMustard, and Brig. Gen. Adams hiked together near Mt. Rainer."]),
    ("hf start words", "Ok, Mr. There is no Dr. What shall we do?",
     ["Ok, Mr.", "There is no Dr.", "What shall we do?"]),
    ("US government", "The U.S. Government decided against action.",
     ["The U.S. Government decided against action."]),
]


@pytest.mark.parametrize("name,text,expected", SENTENCE_GOLDENS,
                         ids=[g[0] for g in SENTENCE_GOLDENS])
def test_sentence_goldens(name, text, expected):
    spans = split_spans(text, (0, len(text)), SENTENCE_RE)
    assert [text[s:e] for s, e in spans] == expected


VALID_NUMBERS = [
    "1", "1,234,567.89", "1234567.89", "-273.15", "3.1415926539",
    "1.602176634e-19", "6.02214076x10^23", "6.62607015E-34",
]


@pytest.mark.parametrize("s", VALID_NUMBERS)
def test_number_matches(s):
    m = NUMBER_RE.fullmatch(s)
    assert m is not None and m.group("number") == s


@pytest.mark.parametrize("s", ["", " ", "abc", "two"])
def test_number_rejects(s):
    assert NUMBER_RE.fullmatch(s) is None


def test_number_values():
    assert number_value("1,234,567.89") == 1234567.89
    assert number_value("-273.15") == -273.15
    assert number_value("6.02214076x10^23") == pytest.approx(6.02214076e23)
    assert number_value("1.602176634e-19") == pytest.approx(1.602176634e-19)


def _flatten_ref_tree(doc):
    acc = []

    def rec(ito, parent):
        idx = len(acc)
        acc.append((ito.start, ito.stop, ito.desc, parent))
        for c in ito.children:
            rec(c, idx)

    rec(doc, -1)
    return acc


DIFF_TEXTS = [
    "Mary spake. Then John went home.\n\nHe said 1,234.56 twice. What else?",
    "Dr. Smith founded Acme Corporation. It is located in Cedarvale.",
    "Totals: -3.5 and 6.02214076x10^23 and plain 42.",
    "One paragraph only, no numbers here.",
    "A?  B!\n\n\nC.",
]


@pytest.mark.parametrize("text", DIFF_TEXTS)
def test_segment_tree_matches_reference_simplenlp(pawpaw_ref, text):
    pp = pawpaw_ref
    doc = pp.nlp.SimpleNlp().from_text(text)
    theirs = _flatten_ref_tree(doc)

    s, e, d, p = segment_text(text)
    ours = [(si, ei, DESC_VOCAB[di], pi) for si, ei, di, pi in zip(s, e, d, p)]
    assert ours == theirs


def test_segment_counts_stable():
    text = "Alpha beta. Gamma delta 12.5!\n\nNew paragraph here."
    s, e, d, p = segment_text(text)
    names = [DESC_VOCAB[i] for i in d]
    assert names.count("paragraph") == 2
    assert names.count("sentence") == 3
    assert names.count("number") == 1


def test_keyed_prefix_matches_reference_pattern(pawpaw_ref):
    """Our KeyedPrefix regex selects the same key spans as the reference's
    pattern on numbered/legal lines."""
    import regex as rx

    from pawpaw_ray.kernels.nlp import KEYED_PREFIX_RE, keyed_prefix

    ref_pat = rx.compile(pawpaw_ref.nlp.KeyedPrefix._key_prefix_pat, rx.DOTALL)
    lines = ["1. first item", "2) second", "3] third", "4: fourth",
             "3.1.4 deep clause", "5-2-1. compound", "no prefix here",
             "12.  spaced", "7.x not a list"]
    for line in lines:
        ours = KEYED_PREFIX_RE.match(line)
        theirs = ref_pat.match(line)
        assert (ours is None) == (theirs is None), line
        if ours:
            assert ours.span("key") == theirs.span("key"), line

    key, rest = keyed_prefix("2) second", (0, 9))
    assert key == (0, 1) and rest == (3, 9)
    key, rest = keyed_prefix("plain", (0, 5))
    assert key is None and rest == (0, 5)


def test_nuco_ordered_fallback():
    from pawpaw_ray.kernels.nlp import NUMBER_RE, WORD_RE, nuco
    from pawpaw_ray.kernels.spans import extract

    def numbers(t, s):
        return extract(t, s, NUMBER_RE, ["number"])

    def words(t, s):
        return extract(t, s, WORD_RE, ["word"])

    # numbers present: first extractor wins
    out = nuco("a 42 b", (0, 6), numbers, words)
    assert [n[2] for n in out] == ["number"]
    # no numbers: falls through to words
    out = nuco("a b", (0, 3), numbers, words)
    assert [n[2] for n in out] == ["word", "word"]
    assert nuco("", (0, 0), numbers, words) == []


def test_number_value_matches_reference(pawpaw_ref):
    """Eager float64 values equal the reference Number's parsed semantics
    on its documented forms (nlp.py:121-223): plain/thousands/decimal/
    scientific/x10^ notation."""
    from pawpaw_ray.kernels.nlp import NUMBER_RE, number_value

    cases = {
        "42": 42.0,
        "-17": -17.0,
        "+3": 3.0,
        "1,234": 1234.0,
        "1,234.56": 1234.56,
        "3.14159": 3.14159,
        ".5": 0.5,
        "6.02e23": 6.02e23,
        "1.5E-3": 1.5e-3,
        "6.02214076x10^23": 6.02214076e23,
        "2 X 10^ 6": 2e6,
        "-1.5e3": -1500.0,
    }
    for raw, expect in cases.items():
        m = NUMBER_RE.fullmatch(raw)
        assert m is not None, raw
        assert number_value(m.group("number")) == pytest.approx(expect), raw

    # differential vs the reference pattern: same match spans on mixed text
    ref_num = pawpaw_ref.nlp.Number()
    text = "pay 1,234.56 or 6.022x10^23 units, -17 deg at .5 rate e.g. 2E3"
    ours = [m.span() for m in NUMBER_RE.finditer(text)]
    theirs = [m.span() for m in ref_num.re.finditer(text)]
    assert ours == theirs
