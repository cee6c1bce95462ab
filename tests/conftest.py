"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding logic is validated
on a virtual CPU mesh per SURVEY.md §7 (mesh-sharded vs single-device
equivalence). Env vars must be set before jax initializes its backends,
hence at conftest import time.
"""

import os

# Force CPU even when the environment pre-registers a TPU platform
# (the harness sets JAX_PLATFORMS and registers a remote-TPU PJRT
# plugin via sitecustomize *before* this conftest runs, so plain env
# manipulation is not enough — the jax.config update below wins as
# long as no computation has run yet). Unit tests must be exact-f32
# and must not pay remote-compile latency.
_USE_TPU = os.environ.get("DELTACONV_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()
else:
    # TPU mode: ALSO register the host CPU backend (the chip platform
    # stays first, hence default). Interpret-mode Pallas surrogates are
    # pinned to the CPU device even in TPU mode — the TPU XLA pipeline
    # elides their bf16 round-trips (f32 -> bf16 -> f32), flipping
    # near-tie max winners vs the rounding reference.
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        os.environ["JAX_PLATFORMS"] = plats + ",cpu"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated pytest runs skip XLA compiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
