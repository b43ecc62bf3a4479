"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on fake CPU devices
(``xla_force_host_platform_device_count=8``) since the CI box has at most one
real TPU chip (SURVEY.md §4 item 3). The environment may export
``JAX_PLATFORMS=axon`` (TPU tunnel); tests must not depend on it, so the
backend is forced to CPU via jax.config (the env var alone is not reliably
honoured by the axon plugin).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from intentbev.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
