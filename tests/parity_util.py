"""Reference-parity harness: execute the engine's extraction rules through
pawpaw itself (imported read-only from /root/reference) and score our
pipeline's triples against it.

The rule set (sentence splitter regexes + the SVO span pattern + the closed
predicate list) is defined once in ``pawpaw_ray.kernels``; here it is run
through pawpaw's own machinery — ``arborform.Split`` over ``nlp.Paragraph``/
``nlp.Sentence`` patterns, ``Ito.regex_fullmatch`` for the SVO match — so
the comparison exercises the reference execution engine, not a re-derivation
of ours.
"""

from __future__ import annotations


def reference_triples_for_text(pp, text: str) -> list[tuple]:
    """(subj, pred, obj, s_start, p_start, o_start) via pawpaw itorators."""
    from pawpaw_ray.kernels.triples import SVO_RE

    para_itor = pp.nlp.Paragraph().get_itor()
    sent_itor = pp.nlp.Sentence().get_itor()
    con = pp.arborform.Connectors.Delegate(sent_itor)
    para_itor.connections.append(con)

    doc = pp.Ito(text, desc="Document")
    out = []
    for sent in para_itor(doc):
        m = sent.regex_fullmatch(SVO_RE)
        if m is None:
            continue
        out.append((m.group("subj"), m.group("pred"), m.group("obj"),
                    m.start("subj"), m.start("pred"), m.start("obj")))
    return out


def score_pr(ours: list[tuple], theirs: list[tuple]) -> tuple[float, float]:
    """Multiset precision/recall."""
    from collections import Counter
    co, ct = Counter(ours), Counter(theirs)
    tp = sum(min(co[k], ct[k]) for k in co)
    precision = tp / max(1, sum(co.values()))
    recall = tp / max(1, sum(ct.values()))
    return precision, recall
