import numpy as np
import pytest
import ray


@pytest.fixture(scope="session")
def ray_session():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


def random_graph(n: int, m: int, seed: int = 42, weighted: bool = False,
                 zipf: float = 1.3):
    """Seeded power-law-ish random multigraph (self-loop-free)."""
    rng = np.random.default_rng(seed)
    # degree-skewed endpoints: mix of zipf-ranked and uniform
    ranks = np.minimum(rng.zipf(zipf, size=2 * m) - 1, n - 1)
    uniform = rng.integers(0, n, size=2 * m)
    pick = rng.random(2 * m) < 0.5
    ends = np.where(pick, ranks, uniform).astype(np.int64)
    src, dst = ends[:m], ends[m:]
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.random(len(src)) + 0.1 if weighted else None
    return src, dst, w
