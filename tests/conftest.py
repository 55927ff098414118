"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding paths are exercised without TPU hardware (SURVEY §4 test plan)."""

import os

# Force the virtual 8-device CPU mesh. The environment presets
# JAX_PLATFORMS=axon (tunneled TPU) and its sitecustomize imports jax at
# interpreter start, so the env var alone is too late — override via
# jax.config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def make_data(n, d, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d), dtype=np.float32)


@pytest.fixture(scope="session")
def small_data():
    """10k x 32 synthetic corpus + 100 queries (mirrors the reference's
    synthetic fixtures, e.g. search_recall_tests.cpp:140-160)."""
    x = make_data(10_000, 32, seed=1)
    q = make_data(100, 32, seed=2)
    ids = np.arange(10_000, dtype=np.int64)
    return x, ids, q


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Bound the single-process compile-cache footprint: the suite compiles
    hundreds of programs across modules, and the accumulated XLA:CPU state
    reproducibly segfaulted a later (tiny) compile inside
    tests/test_workload.py once the suite grew past ~200 cases. Programs
    are overwhelmingly module-local, so clearing between modules costs
    little and keeps the native compiler state small."""
    yield
    jax.clear_caches()
