"""Test config: force an 8-device virtual CPU backend BEFORE jax initializes,
so multi-chip sharding paths are exercised without TPU hardware
(the JAX analog of a fake multi-device backend; SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and overrides
# jax_platforms post-import; override it back so tests run on the virtual
# 8-device CPU backend.
jax.config.update("jax_platforms", "cpu")

# Persist XLA compiles across suite runs: on this 1-core host the suite is
# compile-bound (~33 min cold), and test shapes are deterministic, so warm
# reruns skip most of it.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
