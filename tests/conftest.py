"""Session-scoped Ray fixture: init ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """1k-row deterministic synthetic corpus, generated once."""
    from mhray.synth import SynthSpec, write_corpus

    out = tmp_path_factory.mktemp("corpus")
    spec = SynthSpec(n_rows=1000, seed=1234)
    paths = write_corpus(str(out), spec, n_files=4)
    paths["spec"] = spec
    return paths
