"""Parity: viz renderers vs the reference pepo dumpers.

The reference pepo (``/root/reference/pawpaw/visualization/pepo/pepo.py``)
runs in a subprocess (its package import forces pure-Python ElementTree);
it is fed the SAME tree — rebuilt as Itos from our flat spans — and its
``dumps`` output must equal ours byte-for-byte (modulo os.linesep).
"""

import json
import subprocess
import sys

import pytest

from pawpaw_ray.kernels.nlp import DESC_VOCAB, segment_text
from pawpaw_ray.viz import (render_compact, render_json, render_tree,
                            render_xml, show)

TEXT = ("Dr. Ada Lovelace wrote the first program in 1843.  It computed "
        "Bernoulli numbers!\n\nAlan Turing admired her work. He proved "
        "3.14 things — e.g. decidability.")


def _spans(text):
    s, e, d, p = segment_text(text)
    return [{"start": int(a), "stop": int(b), "desc": int(c), "parent": int(q)}
            for a, b, c, q in zip(s, e, d, p)]


_REF_RUNNER = r"""
import json, sys
sys.modules['_elementtree'] = None  # pepo package import needs pure-Py ET
sys.path.insert(0, '/root/reference')
import pawpaw
from pawpaw.visualization import pepo

payload = json.loads(sys.stdin.read())
text, spans, style = payload["text"], payload["spans"], payload["style"]

itos = [pawpaw.Ito(text, sp["start"], sp["stop"], payload["vocab"][sp["desc"]])
        for sp in spans]
roots = []
for i, sp in enumerate(spans):
    p = sp["parent"]
    if p < 0:
        roots.append(itos[i])
    else:
        itos[p].children.add(itos[i])

cls = {"compact": pepo.Compact, "tree": pepo.Tree,
       "xml": pepo.Xml, "json": pepo.Json}[style]
p = cls()
p.linesep = "\n"
print(json.dumps(p.dumps(*roots)))
"""


def _reference_render(text, spans, style):
    payload = json.dumps(
        {"text": text, "spans": spans, "style": style, "vocab": DESC_VOCAB})
    out = subprocess.run([sys.executable, "-c", _REF_RUNNER], input=payload,
                         capture_output=True, text=True, check=True).stdout
    return json.loads(out)


@pytest.mark.parametrize("style,render", [
    ("compact", render_compact),
    ("tree", render_tree),
    ("xml", render_xml),
    ("json", render_json),
])
def test_pepo_parity(style, render):
    spans = _spans(TEXT)
    theirs = _reference_render(TEXT, spans, style)
    ours = render(TEXT, spans, vocab=DESC_VOCAB)
    assert ours == theirs


def test_show_limits_pull(ray_session):
    """show() renders only k rows and never materializes the dataset."""
    import io

    import pyarrow as pa
    import ray.data as rd

    texts = [TEXT, "Second doc. Short one.", "Third doc here."]
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array(texts, pa.string())})
    from pawpaw_ray.stages.segment import segment_batch
    ds = rd.from_arrow(tbl).map_batches(segment_batch,
                                        batch_format="pyarrow")
    buf = io.StringIO()
    show(ds, k=2, style="compact", file=buf)
    out = buf.getvalue()
    assert out.count("--- doc_id=") == 2
    # each shown row's root line carries the Document desc
    assert out.count("'Document'") == 2


_REF_HL_RUNNER = r"""
import io, json, sys
sys.modules['_elementtree'] = None
sys.path.insert(0, '/root/reference')
import pawpaw
from pawpaw.visualization import sgr
from pawpaw.visualization.highlighter import Highlighter

payload = json.loads(sys.stdin.read())
text, spans = payload["text"], payload["spans"]
itos = [pawpaw.Ito(text, sp["start"], sp["stop"], payload["vocab"][sp["desc"]])
        for sp in spans]
roots = []
for i, sp in enumerate(spans):
    p = sp["parent"]
    if p < 0:
        roots.append(itos[i])
    else:
        itos[p].children.add(itos[i])

h = Highlighter([sgr.Colors.Named.RED, sgr.Colors.Named.GREEN,
                 sgr.Colors.Named.BLUE])
buf = io.StringIO()
stdout, sys.stdout = sys.stdout, buf
for r in roots:
    h.print(r)
sys.stdout = stdout
print(json.dumps(buf.getvalue()))
"""


def test_highlighter_parity():
    """render_highlight vs the reference Highlighter: same traversal, same
    SGR codes (named-color palette), byte-for-byte."""
    from pawpaw_ray.viz import render_highlight

    spans = _spans(TEXT)
    payload = json.dumps({"text": TEXT, "spans": spans, "vocab": DESC_VOCAB})
    theirs = json.loads(subprocess.run(
        [sys.executable, "-c", _REF_HL_RUNNER], input=payload,
        capture_output=True, text=True, check=True).stdout)
    ours = render_highlight(
        TEXT, spans, vocab=DESC_VOCAB,
        palette=("\x1b[41m", "\x1b[42m", "\x1b[44m"))
    assert ours == theirs


def test_highlighter_strip_recovers_text():
    import re

    from pawpaw_ray.viz import render_highlight

    spans = _spans(TEXT)
    out = render_highlight(TEXT, spans, vocab=DESC_VOCAB)
    assert re.sub(r"\x1b\[\d+m", "", out) == TEXT
    # predicate gates coloring but never drops text (leaf 'word' nodes
    # emit colored segments; 'sentence' nodes are fully covered by
    # children here, so their own segments are gaps only)
    out2 = render_highlight(TEXT, spans, vocab=DESC_VOCAB,
                            predicate=lambda d: d == "word")
    assert re.sub(r"\x1b\[\d+m", "", out2) == TEXT
    assert out2.count("\x1b[41m") >= 1
    assert len(out2) < len(out)  # fewer colored segments than color-all
