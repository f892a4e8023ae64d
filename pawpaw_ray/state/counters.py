"""Cluster-wide observability counters for bounded-recall / clamp events.

Worker-side kernels note events (capped LSH buckets, clamped keep-best
scores) into a per-process dict PLUS a fire-and-forget increment to one
tiny named detached actor — per-process counters alone are invisible from
the driver because map tasks run in ephemeral workers (round-4 advice:
capped recall should be visible from the bench output, not only worker
logs).  ``snapshot_events()`` on the driver returns the aggregate;
``bench.py`` embeds it in its JSON line.

Failure posture: counting must never break the computation — every actor
interaction is best-effort (no-op when Ray isn't initialized, swallowed
on races).  The detached actor costs 0 CPUs and dies with the session.
"""

from __future__ import annotations

_ACTOR_NAME = "pawpaw_event_counters"

# per-process mirror (tests drive kernels in-process and read this)
LOCAL_EVENTS: dict[str, int] = {}


class _EventCounter:
    def __init__(self):
        self.c: dict[str, int] = {}

    def incr(self, kind: str, n: int) -> None:
        self.c[kind] = self.c.get(kind, 0) + n

    def snapshot(self) -> dict[str, int]:
        return dict(self.c)

    def reset(self) -> None:
        self.c = {}


def _get_actor(create: bool):
    try:
        import ray
        if not ray.is_initialized():
            return None
        try:
            return ray.get_actor(_ACTOR_NAME)
        except ValueError:
            if not create:
                return None
        return (ray.remote(_EventCounter)
                .options(name=_ACTOR_NAME, lifetime="detached",
                         get_if_exists=True, num_cpus=0).remote())
    except Exception:
        return None


def note_event(kind: str, n: int = 1) -> None:
    """Count an observability event (process-local + cluster aggregate)."""
    LOCAL_EVENTS[kind] = LOCAL_EVENTS.get(kind, 0) + n
    a = _get_actor(create=True)
    if a is not None:
        try:
            a.incr.remote(kind, n)
        except Exception:
            pass


def snapshot_events() -> dict[str, int]:
    """Driver-side aggregate across all workers (empty if none noted)."""
    a = _get_actor(create=False)
    if a is None:
        return {}
    try:
        import ray
        return ray.get(a.snapshot.remote(), timeout=10)
    except Exception:
        return {}


def reset_events() -> None:
    LOCAL_EVENTS.clear()
    a = _get_actor(create=False)
    if a is not None:
        try:
            import ray
            ray.get(a.reset.remote(), timeout=10)
        except Exception:
            pass
