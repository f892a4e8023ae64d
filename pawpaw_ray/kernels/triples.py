"""SVO triple-extraction kernel.

The rule set is defined ONCE here — a closed predicate list and a single
compiled span pattern applied per sentence — so the reference-parity test
harness can execute the *same* rules through pawpaw itorators
(``Split(Sentence.re)`` → ``Extract(SVO pattern)``) and score P/R of the Ray
pipeline against the pawpaw-built extractor on identical input (SURVEY.md §7
step 4; the north rule's triple P/R ≥ 0.95 gate).

Semantics per sentence span: the earliest predicate-phrase occurrence splits
the sentence into subject (text before, must start with a non-space) and
object (text after, trailing whitespace/terminators stripped).  Subject
pronouns are flagged for the cross-turn coreference window.
"""

from __future__ import annotations

import regex as rx

# closed predicate vocabulary — shared with the synthetic data generator
PREDICATES = ["founded", "acquired", "works at", "is located in", "met", "reported"]

SUBJECT_PRONOUNS = frozenset({"He", "She", "They", "It"})

_TERMINATOR_TAIL = r"[\s.!?…]*"


def build_svo_re(predicates: list[str] | None = None):
    return rx.compile(
        r"(?P<subj>\S.*?)\s+(?P<pred>\L<preds>)\s+(?P<obj>\S.*?)" + _TERMINATOR_TAIL + r"$",
        rx.DOTALL,
        preds=list(predicates or PREDICATES),
    )


SVO_RE = build_svo_re()


def extract_triples(text: str, sentence_spans) -> list[dict]:
    """Apply the SVO pattern to each sentence span (windowed fullmatch —
    ``pos``/``endpos``, no slicing).  Returns one dict per matched sentence
    with absolute spans into ``text``."""
    out: list[dict] = []
    for s, e in sentence_spans:
        m = SVO_RE.fullmatch(text, pos=s, endpos=e)
        if m is None:
            continue
        subj = m.group("subj")
        out.append({
            "subj": subj,
            "pred": m.group("pred"),
            "obj": m.group("obj"),
            "s_start": m.start("subj"), "s_stop": m.end("subj"),
            "p_start": m.start("pred"), "p_stop": m.end("pred"),
            "o_start": m.start("obj"), "o_stop": m.end("obj"),
            "subj_is_pronoun": subj in SUBJECT_PRONOUNS,
        })
    return out
