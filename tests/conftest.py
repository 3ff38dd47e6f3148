"""Session-scoped Ray fixture — one local Ray for the whole pytest run."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(ray_session, tmp_path_factory):
    """Deterministic 400-row clip corpus with planted dups + truth pairs."""
    from who_owns_mass_processing_ray import synth

    root = str(tmp_path_factory.mktemp("corpus"))
    synth.generate_clips_parquet(root, 400, seed=42, use_ray=False)
    return root
