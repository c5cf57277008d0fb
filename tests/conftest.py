"""Test config: force CPU with a virtual 8-device mesh so sharding tests run
without TPU hardware (SURVEY.md §4)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS env; force CPU via config so tests
# never touch the (single-client) TPU tunnel.
jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite's cost is dominated by CPU-mesh
# shard_map compiles, which are identical across runs — repeat suite runs
# (the per-change workflow) skip them entirely.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/lp_gnn_tpu_xla_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def random_lp(rng, m=7, n=13, density=0.4, two_sided=False):
    """A small random LP in the reference canonical form."""
    from scipy.sparse import random as sprandom
    from lp_gnn_tpu.io.mps import LPData

    A = sprandom(m, n, density=density, random_state=rng, format="csr",
                 data_rvs=lambda k: rng.randn(k) * 3)
    # ensure no empty rows/cols
    A = A.tolil()
    for i in range(m):
        if A.rows[i] == []:
            A[i, rng.randint(n)] = rng.randn()
    Ac = A.tocsc()
    for j in range(n):
        if Ac.indptr[j] == Ac.indptr[j + 1]:
            A[rng.randint(m), j] = rng.randn()
    A = A.tocsr()
    c = rng.randn(n)
    b_l = np.full(m, -np.inf)
    b_u = rng.rand(m) * 10
    if two_sided:
        two = rng.rand(m) < 0.5
        b_l[two] = b_u[two] - rng.rand(two.sum()) * 5
    lb = np.zeros(n)
    ub = np.full(n, np.inf)
    ub[rng.rand(n) < 0.3] = rng.rand() * 8 + 1
    return LPData(
        c=c, b_l=b_l, A=A, b_u=b_u, lb=lb, ub=ub,
        con_nms=np.array([f"c{i}" for i in range(m)], dtype=object),
        var_nms=np.array([f"x{j}" for j in range(n)], dtype=object),
    )


@pytest.fixture
def small_lp(rng):
    return random_lp(rng)
