"""NLP segmentation kernels: paragraph / sentence / number / word.

Pattern semantics are ported for parity with the reference segmenters
(``/root/reference/pawpaw/nlp/nlp.py`` — ``Paragraph`` :250-311, ``Sentence``
:314-469, ``Number`` :121-223, ``SimpleNlp`` :472-508) so that sentence
boundaries and number trees match the reference exactly (the P/R gate).
Patterns are compiled ONCE at module import — each Ray worker process pays
compilation a single time, never per batch or per row.

``segment_text`` is the flagship kernel: one transcript-turn ``text`` in,
one flat preorder span tree out (``Document → paragraph → sentence →
word | number(→ sign/integer/decimal/exponent)``), as four parallel arrays
ready to be zipped into an Arrow ``list<struct>`` column.
"""

from __future__ import annotations

import regex as rx

from pawpaw_ray.kernels import guard
from pawpaw_ray.kernels.spans import Retention, extract, split_by_boundaries, split_spans

# ---------------------------------------------------------------------------
# Unicode character classes (UNIDATA NamesList; same sets the reference uses,
# nlp.py:10-94)
# ---------------------------------------------------------------------------

BOM_CHARS = "\uFEFF\uFFFE"

# LINE FEED, NEXT LINE, LINE SEPARATOR, PARAGRAPH SEPARATOR
EOL_CHARS = "\u000A\u0085\u2028\u2029"

# TAB, FORM FEED, CARRIAGE RETURN, SPACE, NO-BREAK SPACE, the U+2000-200B
# spacing block, NARROW NO-BREAK SPACE, MEDIUM MATHEMATICAL SPACE,
# IDEOGRAPHIC SPACE
OTHER_WS_CHARS = (
    "\u0009\u000C\u000D\u0020\u00A0"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200A\u200B"
    "\u202F\u205F\u3000"
)

SINGLE_QUOTES = "\u0027\u0060\u00B4\u2018\u2019\u201A\u201B\u275B\u275C\u275F"
DOUBLE_QUOTES = "\u0022\u201C\u201D\u201E\u201F\u275D\u275E\u2760"

TRIMMABLE_WS = BOM_CHARS + EOL_CHARS + OTHER_WS_CHARS


def char_class(chars: str, inclusive: bool = True) -> str:
    """Regex character class from a literal char set (nlp.py:97-102)."""
    return f"[{'' if inclusive else '^'}{rx.escape(chars)}]"


# ---------------------------------------------------------------------------
# Paragraph splitter (nlp.py:250-311): >= min_separators EOL runs, each
# optionally preceded by non-EOL whitespace.
# ---------------------------------------------------------------------------

def build_paragraph_re(min_separators: int = 2):
    return rx.compile(
        rf"(?:{char_class(OTHER_WS_CHARS)}*\L<eols>){{{min_separators},}}",
        rx.DOTALL,
        eols=list(EOL_CHARS),
    )


PARAGRAPH_RE = build_paragraph_re(2)


# ---------------------------------------------------------------------------
# Sentence boundary splitter (nlp.py:314-462).  The boundary is whitespace
# preceded by word-char + terminator (+ optional suffix quotes/brackets) and
# followed by an uppercase/digit start — with carve-outs for abbreviation
# classes, name initials and "U.S. Government".
# ---------------------------------------------------------------------------

SENT_TERMINATORS = [r"\.", r"\.{3,}", "…", r"[\!\?]+"]

HF_START_WORDS = [
    "A", "How", "In", "It", "The", "There", "This",
    "What", "When", "Where", "Who", "Why",
]

# abbreviations typically followed by a digit (circa, edition, page, …)
NUMERIC_ABBRS = ["c.", "ca.", "ed.", "illus.", "no.", "p.", "pp.", "ver.", "vol."]

# abbreviations that are not sentence boundaries even before an uppercase:
# honorifics/titles + military ranks (nlp.py:360-418)
IGNORE_ABBRS = [
    "Ald.", "Asst.", "Dr.", "Drs.", "ed.", "e.g.", "Fr.", "Gov.", "Hon.",
    "ibid.", "i.e.", "illus.", "Insp.", "Messrs.", "Mlle.", "Mmes.", "Mr.",
    "Mrs.", "Ms.", "Msgr.", "Mt.", "pub.", "pseud.", "Pres.", "Prof.",
    "qtd.", "Rep.", "Reps.", "Rev.", "Sen.", "Sens.", "St.", "vis.", "v.",
    "vs.",
    # military officer ranks
    "Lt.", "Capt.", "Cpt.", "Maj.", "Cmdr.", "Col.", "Brig.", "Gen.", "Adm.",
    # military enlisted ranks
    "Pvt.", "Pfc.", "Spc.", "Cpl.", "Sgt.",
]

_SEN_WS = ["\r\n", "\n"] + list(OTHER_WS_CHARS)
_SEN_PREFIX = list(SINGLE_QUOTES + DOUBLE_QUOTES + "([{")
_SEN_SUFFIX = list(SINGLE_QUOTES + DOUBLE_QUOTES + ")]}")

_EXCEPTION_LOOKBEHINDS = (
    r"(?<!\L<ignores>)"
    r"(?<!\L<num_abbrs>(?=\L<sen_ws>\d))"
    r"(?<![A-Z][a-z]+\L<sen_ws>[A-Z]\.(?=\L<sen_ws>[A-Z][a-z]+))"
    r"(?<!U\.S\.(?=\L<sen_ws>Government))"
)

_BOUNDARY_RULES = [
    r"\L<sen_ws>*$",                                      # end of document
    r"\L<sen_ws>{2,}",                                    # >= 2 whitespace
    r"\L<sen_ws>(?=\L<sen_pre>*\L<hf_starts>\L<sen_ws>)",  # high-freq start word
    _EXCEPTION_LOOKBEHINDS + r"\L<sen_ws>(?=\L<sen_pre>*[A-Z\d])",  # catch-all
]

SENTENCE_RE = rx.compile(
    r"(?<=\w(" + "|".join(SENT_TERMINATORS) + r")\L<sen_suf>*)"
    + r"(?:" + "|".join(f"(?:{r})" for r in _BOUNDARY_RULES) + r")",
    rx.DOTALL,
    sen_suf=_SEN_SUFFIX,
    sen_ws=_SEN_WS,
    sen_pre=_SEN_PREFIX,
    hf_starts=HF_START_WORDS,
    num_abbrs=NUMERIC_ABBRS,
    ignores=IGNORE_ABBRS,
)


# ---------------------------------------------------------------------------
# Number extractor (nlp.py:121-161): sign, integer with optional thousands
# separators, decimal, scientific exponent in E-notation or x10^ notation.
# Group tree: number → sign / integer / decimal / exponent(→ sign).
# ---------------------------------------------------------------------------

def build_number_re(decimal_point: str = ".", thousands_sep: str = ",",
                    thousands_sep_optional: bool = True):
    sign = r"(?P<sign>[-+])"
    exp_e = r"[Ee]" + sign + r"?\d+"
    exp_x10 = r" ?[Xx\u2715] ?10\^ ?" + sign + r"?\d+"
    exponent = r"(?P<exponent>" + exp_e + "|" + exp_x10 + r")"
    integer = r"(?P<integer>\d{1,3}(?:" + rx.escape(thousands_sep) + r"\d{3})+"
    if thousands_sep_optional:
        integer += r"|\d+"
    integer += r")"
    decimal = r"(?P<decimal>" + rx.escape(decimal_point) + r"\d+)"
    num = (
        f"(?P<number>{sign}?"
        f"(?:{integer}{decimal}?"
        f"|{decimal})"
        f"{exponent}?)"
    )
    return rx.compile(num, rx.DOTALL)


NUMBER_RE = build_number_re()


def number_value(s: str, decimal_point: str = ".", thousands_sep: str = ",") -> float:
    """Eager float64 value of a NUMBER_RE match (replaces the reference's
    lazy ``value_func`` — typed columns are computed at extraction time)."""
    s = s.replace(thousands_sep, "").replace(decimal_point, ".")
    low = s.lower()
    for mark in ("x", "\u2715"):
        if mark in low and "10^" in low:
            mant, _, exp = low.partition(mark)
            exp = exp.replace(" ", "").removeprefix("10^")
            return float(mant) * 10.0 ** float(exp)
    return float(s)


# ---------------------------------------------------------------------------
# Word extractor (nlp.py:473,488-490): word chars joined by optional single
# quote or hyphen(+ws) connectors.
# ---------------------------------------------------------------------------

WORD_RE = rx.compile(
    r"(?P<word>\w(?:(?:\L<sqs>|-\s*)?\w)*)",
    rx.DOTALL,
    sqs=list(SINGLE_QUOTES),
)


# ---------------------------------------------------------------------------
# KeyedPrefix (nlp.py:226-247): list/legal numbering prefixes — "1." "2)"
# "3.1.4" "5-2-1." followed by whitespace; the <key> group is the number.
# ---------------------------------------------------------------------------

_KP_COMPOUND = r"(?P<key>\d+(?:[\.\-]\d+)+)\.?"
_KP_INT = r"(?P<key>\d+)[\)\]\.\-:]"
KEYED_PREFIX_RE = rx.compile(
    r"(?:" + _KP_COMPOUND + r"|" + _KP_INT + r")[ \t]+", rx.DOTALL)


def keyed_prefix(text: str, span) -> tuple:
    """(key_span, rest_span) when the line starts with a list/legal prefix,
    else (None, span)."""
    m = guard.match(KEYED_PREFIX_RE, text, span[0], span[1], trusted=True)
    if m is None:
        return None, span
    return m.span("key"), (m.end(), span[1])


# ---------------------------------------------------------------------------
# Nuco — ordered fallback (reference arborform Nuco, nuco.py:7-23): the
# first extractor yielding >= 1 result wins, per row.
# ---------------------------------------------------------------------------

def nuco(text: str, span, *extractors):
    """Apply ``extractors`` (callables ``(text, span) -> list``) in order;
    return the first non-empty result (empty list if all come up empty)."""
    for ex in extractors:
        out = ex(text, span)
        if out:
            return out
    return []


# ---------------------------------------------------------------------------
# Flagship kernel: one turn's text → flat preorder span tree.
# ---------------------------------------------------------------------------

# fixed desc vocabulary (indices are the dictionary codes used in Arrow)
DESC_VOCAB = [
    "Document", "paragraph", "sentence", "word",
    "number", "sign", "integer", "decimal", "exponent", "char",
]
DESC_ID = {d: i for i, d in enumerate(DESC_VOCAB)}
D_DOC, D_PARA, D_SENT, D_WORD, D_NUM = 0, 1, 2, 3, 4

_NUM_GROUP_KEYS = ["number", "sign", "integer", "decimal", "exponent"]


def segment_text(
    text: str,
    include_chars: bool = False,
) -> tuple[list[int], list[int], list[int], list[int]]:
    """Segment one document/turn into the SimpleNlp tree, flattened preorder.

    Pipeline shape (mirrors ``SimpleNlp.__init__``, nlp.py:475-499):
    paragraph split → sentence split (children) → number split with
    ``Retention.ALL`` (children) → non-number pieces delegated to word
    extraction (words become direct children of the sentence).

    Returns parallel lists ``(starts, stops, desc_ids, parents)``; node 0 is
    the ``Document`` root spanning the whole text.
    """
    starts: list[int] = [0]
    stops: list[int] = [len(text)]
    descs: list[int] = [D_DOC]
    parents: list[int] = [-1]

    for p_span in split_spans(text, (0, len(text)), PARAGRAPH_RE, trusted=True):
        p_idx = len(starts)
        starts.append(p_span[0]); stops.append(p_span[1])
        descs.append(D_PARA); parents.append(0)

        for s_span in split_spans(text, p_span, SENTENCE_RE, trusted=True):
            s_idx = len(starts)
            starts.append(s_span[0]); stops.append(s_span[1])
            descs.append(D_SENT); parents.append(p_idx)

            # number boundaries within the sentence
            num_nodes = extract(text, s_span, NUMBER_RE, _NUM_GROUP_KEYS, trusted=True)
            num_roots = [(i, nd) for i, nd in enumerate(num_nodes) if nd[3] == -1]
            pieces = split_by_boundaries(
                s_span, [(nd[0], nd[1]) for _, nd in num_roots], Retention.ALL
            )
            root_iter = iter(num_roots)
            for (ps, pe), is_boundary in pieces:
                if is_boundary:
                    # emit the number subtree under the sentence
                    ri, _rnd = next(root_iter)
                    offsets: dict[int, int] = {}
                    j = ri
                    while j < len(num_nodes):
                        nd = num_nodes[j]
                        if j != ri and nd[3] == -1:
                            break
                        offsets[j] = len(starts)
                        starts.append(nd[0]); stops.append(nd[1])
                        descs.append(DESC_ID[nd[2]])
                        parents.append(s_idx if nd[3] == -1 else offsets[nd[3]])
                        j += 1
                else:
                    # delegate: words extracted from the non-number piece
                    for w in extract(text, (ps, pe), WORD_RE, ["word"], trusted=True):
                        starts.append(w[0]); stops.append(w[1])
                        descs.append(D_WORD); parents.append(s_idx)

    return starts, stops, descs, parents
