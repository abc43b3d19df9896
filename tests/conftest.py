import numpy as np
import pytest

from graph_partitioning_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s


def random_edges(n: int, m: int, seed: int, weighted: bool = False):
    """Deterministic random multigraph as (src, dst, weight) numpy arrays;
    self-loops excluded, duplicates possible (callers canonicalize)."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=m * 2)
    dst = rng.integers(0, n, size=m * 2)
    keep = src != dst
    src, dst = src[keep][:m], dst[keep][:m]
    w = rng.integers(1, 5, size=len(src)).astype(float) if weighted else np.ones(len(src))
    return src.astype(np.int64), dst.astype(np.int64), w


@pytest.fixture(scope="session")
def small_graph(spark):
    """~200-vertex deterministic directed graph DataFrame + numpy arrays."""
    src, dst, w = random_edges(200, 800, seed=7)
    df = spark.createDataFrame(
        list(zip(src.tolist(), dst.tolist(), w.tolist())), "src long, dst long, weight double"
    )
    return df, (src, dst, w)
