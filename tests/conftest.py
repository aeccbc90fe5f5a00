"""Test configuration.

Tests run on a simulated 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the TPU-native analog of a fake backend —
see SURVEY.md §4). The environment ships with the axon TPU plugin
pre-registered via sitecustomize and ``JAX_PLATFORMS=axon``; we force the
CPU backend *before any backend is initialized* so unit tests are fast and
hermetic. Set ``DETR_TPU_TEST_ON_TPU=1`` to run the suite on the real chip.
"""

import os

if os.environ.get("DETR_TPU_TEST_ON_TPU") != "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: the suite is dominated by XLA:CPU
    # compiles of model graphs; cache them across runs.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
