"""Differential grid: span-relative str_* kernels vs the reference Ito
methods over the same (text, span) cases — including negative/None index
grids and the CPython startswith/endswith quirks the reference replicates."""

import itertools

import pytest

from pawpaw_ray.kernels import strfns

TEXT = "  The quick  brown fox 123 jumps\nover the lazy dog!  "
SPANS = [(0, len(TEXT)), (2, 32), (13, 26), (5, 5)]
IDX = [None, 0, 1, 3, -1, -4, 100, -100]


def _ito(pp, span):
    return pp.Ito(TEXT, *span)


def test_search_family(pawpaw_ref):
    pp = pawpaw_ref
    for span in SPANS:
        it = _ito(pp, span)
        for sub in ["o", "fox", "  ", "zzz", "e"]:
            for s, e in itertools.product(IDX, IDX):
                assert strfns.str_count(TEXT, span, sub, s, e) == it.str_count(sub, s, e)
                assert strfns.str_find(TEXT, span, sub, s, e) == it.str_find(sub, s, e)
                assert strfns.str_rfind(TEXT, span, sub, s, e) == it.str_rfind(sub, s, e)
        assert strfns.str_eq(TEXT, span, str(it)) == it.str_eq(str(it)) is True
        assert strfns.str_eq(TEXT, span, "nope") == it.str_eq("nope")


def test_affix_quirks(pawpaw_ref):
    pp = pawpaw_ref
    for span in SPANS:
        it = _ito(pp, span)
        for affix in ["The", "fox", "", ("fox", "dog"), "  "]:
            for s, e in itertools.product(IDX, IDX):
                assert (strfns.str_startswith(TEXT, span, affix, s, e)
                        == it.str_startswith(affix, s, e)), (span, affix, s, e)
                assert (strfns.str_endswith(TEXT, span, affix, s, e)
                        == it.str_endswith(affix, s, e)), (span, affix, s, e)


def test_predicates(pawpaw_ref):
    pp = pawpaw_ref
    cases = ["abc", "ABC", "aBc", "123", "a1", " \t", "", "Abc Def", "_id9",
             "½", "¡prin"]
    text = "|".join(cases)
    pos = 0
    for c in cases:
        span = (pos, pos + len(c))
        it = pp.Ito(text, *span)
        for name in ["isalnum", "isalpha", "isascii", "isdecimal", "isdigit",
                     "isidentifier", "islower", "isnumeric", "isprintable",
                     "isspace", "istitle", "isupper"]:
            ours = getattr(strfns, f"str_{name}")(text, span)
            theirs = getattr(it, f"str_{name}")()
            assert ours == theirs, (c, name)
        pos += len(c) + 1


def test_strip_family(pawpaw_ref):
    pp = pawpaw_ref
    for span in SPANS:
        it = _ito(pp, span)
        for chars in [None, " ", " Td", "og! "]:
            assert strfns.str_strip(TEXT, span, chars) == it.str_strip(chars).span
            assert strfns.str_lstrip(TEXT, span, chars) == it.str_lstrip(chars).span
            assert strfns.str_rstrip(TEXT, span, chars) == it.str_rstrip(chars).span


def test_partition_family(pawpaw_ref):
    pp = pawpaw_ref
    for span in SPANS:
        it = _ito(pp, span)
        for sep in ["o", "fox", "zzz", " "]:
            ours = strfns.str_partition(TEXT, span, sep)
            theirs = tuple(x.span for x in it.str_partition(sep))
            assert ours == theirs, (span, sep)
            ours = strfns.str_rpartition(TEXT, span, sep)
            theirs = tuple(x.span for x in it.str_rpartition(sep))
            assert ours == theirs, (span, sep)
    with pytest.raises(ValueError):
        strfns.str_partition(TEXT, SPANS[0], "")


def test_split_family(pawpaw_ref):
    pp = pawpaw_ref
    for span in SPANS:
        it = _ito(pp, span)
        for sep in [None, " ", "o", "zzz"]:
            for maxsplit in [-1, 0, 1, 2, 100]:
                ours = strfns.str_split(TEXT, span, sep, maxsplit)
                ours_r = strfns.str_rsplit(TEXT, span, sep, maxsplit)
                if sep is None and span[0] != 0:
                    # reference defect: _nearest_non_ws_sub (ito.py:1168)
                    # re-adds self.start to an already-absolute index, so
                    # whitespace splits of offset itos drop leading chars
                    # of every word after the first ('quick' → 'uick').
                    # Our oracle here is str.split itself.
                    if maxsplit == -1:
                        sub = TEXT[span[0]:span[1]]
                        assert [TEXT[a:b] for a, b in ours] == sub.split()
                        assert [TEXT[a:b] for a, b in ours_r] == sub.rsplit()
                    continue
                theirs = [x.span for x in it.str_split(sep, maxsplit)]
                assert ours == theirs, ("split", span, sep, maxsplit)
                theirs = [x.span for x in it.str_rsplit(sep, maxsplit)]
                assert ours_r == theirs, ("rsplit", span, sep, maxsplit)


def test_splitlines(pawpaw_ref):
    pp = pawpaw_ref
    text = "one\ntwo\r\nthree\rfour\x85five six\n"
    span = (0, len(text))
    it = pp.Ito(text)
    for keepends in [False, True]:
        ours = strfns.str_splitlines(text, span, keepends)
        theirs = [x.span for x in it.str_splitlines(keepends)]
        assert ours == theirs, keepends


def test_removeaffix(pawpaw_ref):
    pp = pawpaw_ref
    for span in SPANS:
        it = _ito(pp, span)
        for affix in ["The", "  ", "dog!  ", "zzz", ""]:
            assert (strfns.str_removeprefix(TEXT, span, affix)
                    == it.str_removeprefix(affix).span)
            assert (strfns.str_removesuffix(TEXT, span, affix)
                    == it.str_removesuffix(affix).span)
