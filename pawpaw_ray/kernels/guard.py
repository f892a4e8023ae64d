"""Runaway-regex bounding.

The reference threads ``timeout=`` / ``concurrent=`` through every regex
call (``/root/reference/pawpaw/ito.py:888-956``).  At 100 TB one
pathological pattern x document pair (catastrophic backtracking) would
otherwise hang a Ray task past its retry budget.  The ``regex`` module's
``timeout=`` interrupts a single backtracking match MID-CALL — something
a wall-clock check between calls cannot do — so the guard lives at the
pattern-call level, with row-level quarantine at the stage level
(``stages/segment.py``).

Two tiers (a non-None timeout forces ``regex`` off its C fast loop —
measured ~2x on small windows — so always-on would tax the hot path ~16%):

- **untrusted** (default): user-supplied patterns (arborform Extract/Split
  connectors, ad-hoc ``extract``/``split_spans`` calls) get the hard
  per-call bound ``REGEX_TIMEOUT`` (env ``PAWPAW_RAY_REGEX_TIMEOUT``,
  default 10 s; 0 disables).
- **trusted**: the engine's audited built-ins (paragraph/sentence/word/
  number/table patterns — linear, no nested quantifiers) run unguarded
  unless ``TRUSTED_TIMEOUT`` (env ``PAWPAW_RAY_TRUSTED_REGEX_TIMEOUT``,
  default off) opts them in.

The ENV VARS are parsed once at import (a per-call ``os.environ`` read
would tax the hot path for nothing); the MODULE ATTRIBUTES
``guard.REGEX_TIMEOUT`` / ``guard.TRUSTED_TIMEOUT`` are looked up at
every call, so tests/operators adjust per process by rebinding those —
setting the env var after import has no effect.
"""

from __future__ import annotations

import os

REGEX_TIMEOUT: float | None = (
    float(os.environ.get("PAWPAW_RAY_REGEX_TIMEOUT", "10")) or None)
TRUSTED_TIMEOUT: float | None = (
    float(os.environ.get("PAWPAW_RAY_TRUSTED_REGEX_TIMEOUT", "0")) or None)


def finditer(pattern, text: str, pos: int = 0, endpos: int | None = None,
             trusted: bool = False, **kw):
    """``pattern.finditer`` windowed by pos/endpos under the tier's budget.

    Stdlib ``re`` patterns (no ``timeout`` kwarg) fall through unguarded —
    only ``regex``-compiled patterns can be interrupted.
    """
    if endpos is None:
        endpos = len(text)
    timeout = TRUSTED_TIMEOUT if trusted else REGEX_TIMEOUT
    if timeout is None:
        return pattern.finditer(text, pos=pos, endpos=endpos, **kw)
    try:
        return pattern.finditer(text, pos=pos, endpos=endpos,
                                timeout=timeout, **kw)
    except TypeError:  # stdlib re pattern
        return pattern.finditer(text, pos=pos, endpos=endpos, **kw)


def match(pattern, text: str, pos: int = 0, endpos: int | None = None,
          trusted: bool = False):
    """``pattern.match`` windowed by pos/endpos under the tier's budget."""
    if endpos is None:
        endpos = len(text)
    timeout = TRUSTED_TIMEOUT if trusted else REGEX_TIMEOUT
    if timeout is None:
        return pattern.match(text, pos=pos, endpos=endpos)
    try:
        return pattern.match(text, pos=pos, endpos=endpos, timeout=timeout)
    except TypeError:
        return pattern.match(text, pos=pos, endpos=endpos)
