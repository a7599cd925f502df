"""Session-scoped Ray + shared fixture corpus.

Ray is initialised ONCE per pytest session (driver instruction); no
test or library module may call ray.init/ray.shutdown itself.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory) -> str:
    """1k-doc deterministic corpus with golden truth (FIXTURES.md §1)."""
    from event_deduplication_ray import fixtures as F

    root = str(tmp_path_factory.mktemp("corpus"))
    return F.materialize_corpus(root, 1000, seed=42)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
