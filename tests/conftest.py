import os
import shutil

import pytest

TEST_SEED = 7
TEST_CONVS = 40
FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Deterministic 40-conv transcript corpus (no skew tail), matching the
    committed golden fixtures (tools/gen_fixtures.py 40 7)."""
    from agraph_ray.synth import generate_transcripts
    d = str(tmp_path_factory.mktemp("corpus"))
    generate_transcripts(d, n_convs=TEST_CONVS, seed=TEST_SEED,
                         num_shards=4, skew=False)
    return d


@pytest.fixture(scope="session")
def kg_out(ray_session, corpus_dir, tmp_path_factory):
    """One shared end-to-end build used by several invariant tests."""
    from agraph_ray.config import KGConfig
    from agraph_ray.pipelines.kg_build import build_kg
    out = str(tmp_path_factory.mktemp("kg_out")) + "/run"
    shutil.rmtree(out, ignore_errors=True)
    res = build_kg(corpus_dir, out, KGConfig())
    return res
