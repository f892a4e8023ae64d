"""The reference's golden sentence-boundary cases
(`/root/reference/tests/nlp/test_nlp.py:68-184` — the 15 linguistic
scenarios its Sentence splitter is specified by), run through OUR kernel
(SURVEY.md §5 strategy: port the golden segmentation cases)."""

import pytest

from pawpaw_ray.kernels.nlp import SENTENCE_RE
from pawpaw_ray.kernels.spans import split_spans

GOLDEN = [
    ("EOF", "Yes.", ["Yes."]),
    ("Two whitespace", "The king was John I.  Henry was his son.",
     ["The king was John I.", "Henry was his son."]),
    ("Period", "Mary spake. Then John", ["Mary spake.", "Then John"]),
    ("Question mark", "What day is it? Tuesday.",
     ["What day is it?", "Tuesday."]),
    ("Exclamation mark", "Wait! I want to come.",
     ["Wait!", "I want to come."]),
    ("Multiple EOS delimiters",
     "Wait... how can that be?!? Tell me!! Why is this so hard!?!",
     ["Wait... how can that be?!?", "Tell me!!", "Why is this so hard!?!"]),
    ("Sentence starts with number",
     "He lived a long life. 100 years approximately.",
     ["He lived a long life.", "100 years approximately."]),
    ("Number following numeric abbreviation",
     "Hippocrates was born c. 460 bce.  See pp. 431 in your history book "
     "for details.",
     ["Hippocrates was born c. 460 bce.",
      "See pp. 431 in your history book for details."]),
    ("Numbers with decimals",
     "The plane landed 1.5 south of the airport; approximately 32.2540° N, "
     "110.9742°.",
     ["The plane landed 1.5 south of the airport; approximately 32.2540° N, "
      "110.9742°."]),
    ("URLs",
     "https://github.com/rlayers/pawpaw is home to interesting software.",
     ["https://github.com/rlayers/pawpaw is home to interesting software."]),
    ("Mid-sentence abbreviations",
     "Jane et. al. worked for Smith & Co. last year.",
     ["Jane et. al. worked for Smith & Co. last year."]),
    ("Possessive abbreviations",
     "Martin Luther King Jr.'s legacy endures.",
     ["Martin Luther King Jr.'s legacy endures."]),
    ("Exclusion abbreviations",
     "Dr. Francis, brother of Prof.\nMustard, and Brig. Gen. Adams hiked "
     "together near Mt. Rainer.",
     ["Dr. Francis, brother of Prof.\nMustard, and Brig. Gen. Adams hiked "
      "together near Mt. Rainer."]),
    ("High frequency start words",
     "Ok, Mr. There is no Dr. What shall we do?",
     ["Ok, Mr.", "There is no Dr.", "What shall we do?"]),
    ("U.S. Government",
     "The U.S. Government decided against action.",
     ["The U.S. Government decided against action."]),
]


@pytest.mark.parametrize("name,text,expected",
                         GOLDEN, ids=[g[0] for g in GOLDEN])
def test_golden_sentence_boundaries(name, text, expected):
    spans = split_spans(text, (0, len(text)), SENTENCE_RE)
    got = [text[a:b] for a, b in spans]
    assert got == expected
