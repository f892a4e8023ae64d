"""The span ``__format__`` mini-language.

Re-expresses ``/root/reference/pawpaw/ito.py:598-716``: a format spec is a
string whose ``%``-directives expand against a span — ``%span`` /
``%start`` / ``%stop`` (each taking a Python int format spec after ``:``),
``%string`` / ``%desc`` / ``%substr`` / ``%value`` (each taking an
optional ``!`` conversion ``a``/``r`` with slice counts and a ``:`` width
with abbreviation suffix and position), ``'% '`` (zero-width space —
removed), ``%%`` (literal).  Doubled escapes and unknown directives pass
through untouched, matching the reference's escape scan
(``util.py:8-37``).

Row-local presentation kernel: ``format_span`` for one span,
``make_format_batch`` for a Dataset stage over span columns.
"""

from __future__ import annotations

import regex as rx

_INT_DIRECTIVES = ("span", "start", "stop")
_STR_DIRECTIVES = ("desc", "string", "substr", "value")

# patterns mirror ito.py:609-632
_PAT_ZWS = r"(?P<zws> )"
_PAT_INT = (r"(?P<dir>" + "|".join(_INT_DIRECTIVES) + r")"
            r"(?:\:"
            r"(?:(?P<fill>.)?(?P<align>[\<\>\=\^]))?"
            r"(?P<sign>[\+\-])?"
            r"(?P<hash>#)?"
            r"(?P<zero>0)?"
            r"(?P<width>\d+)?"
            r"(?P<grouping_option>[_,])?"
            r"(?P<type>[bcdeEfFgGnosxX%])?"
            r")?")
_PAT_STR = (r"(?P<dir>" + "|".join(_STR_DIRECTIVES) + r")"
            r"(?:\!"
            r"(?P<lslice>\d+)?"
            r"(?P<conv>[ar])"
            r"(?P<rslice>\d+)?"
            r")?"
            r"(?:\:"
            r"(?P<abbr_pos>[\<\^\>])?"
            r"(?P<width>\d+)"
            r"(?P<abbr>.+)?"
            r")?")
_RE_FORMAT = rx.compile(
    r"%(?:" + "|".join([_PAT_ZWS, _PAT_INT, _PAT_STR]) + r")", rx.DOTALL)


def _pct_indices(spec: str) -> list[int]:
    """Indices of non-doubled '%' chars (``util.py:find_escapes`` with
    escape='%'): '%%' is a literal, a trailing lone '%' too."""
    out = []
    esc = False
    for i, c in enumerate(spec):
        if c == "%":
            esc = not esc
        elif esc:
            out.append(i - 1)
            esc = False
    return out


def format_span(spec: str, text: str, start: int, stop: int,
                desc: str | None = None, value=None) -> str:
    """Expand ``spec`` against one span.  ``value`` defaults to the
    substring (the reference's ``Ito.value()`` without a value_func)."""
    if not spec:
        return text[start:stop]

    idxs = _pct_indices(spec)
    matches = []
    for i, st in enumerate(idxs):
        m = (_RE_FORMAT.match(spec, st) if i == len(idxs) - 1
             else _RE_FORMAT.match(spec, st, idxs[i + 1]))
        if m is not None:
            matches.append(m)

    rv = spec
    for m in matches[::-1]:
        if m.group("zws") is not None:
            rv = rv[:m.span()[0]] + rv[m.span()[1]:]
            continue

        directive = m.group("dir")
        if directive in _INT_DIRECTIVES:
            fstr = spec[m.span("dir")[1] + 1:m.span(0)[1]]
            if directive == "span":
                sub = f"({format(start, fstr)}, {format(stop, fstr)})"
            elif directive == "start":
                sub = format(start, fstr)
            else:  # stop
                sub = format(stop, fstr)
        else:  # str directives
            if directive == "string":
                sub = text
            elif directive == "desc":
                sub = desc or ""
            elif directive == "substr":
                sub = text[start:stop]
            else:  # value
                sub = text[start:stop] if value is None else str(value)

            conv = m.group("conv")
            if conv is not None:
                sub = ascii(sub) if conv == "a" else repr(sub)
                lslice = int(m.group("lslice")) if m.group("lslice") else 0
                rslice = m.group("rslice")
                rslice = (None if rslice is None or rslice == "0"
                          else -int(rslice))
                sub = sub[slice(lslice, rslice)]

            width = m.group("width")
            if width is not None and (width := int(width)) < len(sub):
                abbr = m.group("abbr") or ""
                len_abbr = len(abbr)
                if len_abbr >= width:
                    sub = abbr[len_abbr - width:]
                else:
                    abbr_pos = m.group("abbr_pos")
                    if abbr_pos == "<":
                        sub = abbr + sub[len_abbr - width:]
                    elif abbr_pos == "^":
                        post_len = (width - len_abbr) // 2
                        post = sub[-post_len:] if post_len > 0 else ""
                        pre = sub[:width - len(post) - len_abbr]
                        sub = pre + abbr + post
                    else:  # empty or '>' (default)
                        sub = sub[:width - len_abbr] + abbr

        rv = rv[:m.span()[0]] + sub + rv[m.span()[1]:]

    return rv


def make_format_batch(spec: str, text_col: str = "text",
                      start_col: str = "start", stop_col: str = "stop",
                      desc_col: str | None = "desc",
                      out_col: str = "formatted"):
    """``map_batches`` UDF: formatted string per span row."""
    import pyarrow as pa

    def format_batch(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        starts = batch[start_col].to_pylist()
        stops = batch[stop_col].to_pylist()
        descs = (batch[desc_col].to_pylist() if desc_col is not None
                 and desc_col in batch.column_names else [None] * len(texts))
        vals = [format_span(spec, t, s, e, d)
                for t, s, e, d in zip(texts, starts, stops, descs)]
        return batch.append_column(out_col, pa.array(vals, pa.string()))

    return format_batch
