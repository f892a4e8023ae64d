import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pawpaw_ref():
    """The reference library itself, imported read-only for differential
    tests (semantics oracle — never copied)."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import pawpaw
    return pawpaw


@pytest.fixture(scope="session")
def tiny_transcripts(ray_session):
    """~2k-turn deterministic fixture (generated once, cached in /tmp)."""
    from pawpaw_ray.datagen import ensure_transcripts
    return ensure_transcripts(2000, use_ray=False)
