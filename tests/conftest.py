import numpy as np
import pytest
import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def source_target():
    """Mirrors the reference session fixture (tests/conftest.py:5-11):
    seeded 20x5 source and 50x5 target."""
    rng = np.random.RandomState(42)
    source = rng.rand(20, 5)
    target = rng.rand(50, 5)
    return source, target
