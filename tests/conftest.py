import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def ref_corpus(tmp_path_factory):
    """The reference-project fixture corpus (5 NAER projects + synthetic)."""
    from naer_ray.testdata import corpus_dir

    return corpus_dir("ref")


@pytest.fixture(scope="session")
def tiny_corpus():
    from naer_ray.testdata import corpus_dir

    return corpus_dir("tiny")
