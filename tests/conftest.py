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


@pytest.fixture(scope="session")
def pipeline_run(ray_session, small_corpus, tmp_path_factory):
    """One flagship run over the shared 1k corpus, reused across modules."""
    from mhray.config import PRESETS
    from mhray.pipelines.dedup import pairs_with_ids, run_dedup

    out = str(tmp_path_factory.mktemp("run"))
    cfg = PRESETS["captions"]
    res = run_dedup(small_corpus["images"], out, cfg, num_parts=4)
    pairs = pairs_with_ids(res, num_parts=4).take_all()
    clusters = res["clusters"].take_all()
    return {"res": res, "pairs": pairs, "clusters": clusters,
            "out": out, "cfg": cfg}


@pytest.fixture(scope="session")
def oracle_run(small_corpus):
    import numpy as np
    import pyarrow.parquet as pq

    from mhray import oracle as O
    from mhray.config import PRESETS

    imgs = pq.read_table(small_corpus["images"])
    cfg = PRESETS["captions"]
    return O.find_pairs(
        imgs.column("image_id").to_pylist(),
        imgs.column("caption").to_pylist(),
        np.asarray(imgs.column("phash"), dtype=np.int64),
        cfg,
    )
