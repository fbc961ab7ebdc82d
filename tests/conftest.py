"""Shared pytest fixtures. Ray is initialised ONCE per session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import os

    import ray

    # inherited by raylet → every worker: large allocations come from
    # the reusable heap (this box's page faults run at only ~MB/s; see
    # ray_script_extract._tune_malloc)
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True)
    yield
    ray.shutdown()
