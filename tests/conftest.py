"""Test env: force CPU with an 8-device virtual mesh, so sharding tests run
without TPU hardware.

Note: this image pre-imports jax with JAX_PLATFORMS=axon (TPU tunnel), so the
env var is already frozen — jax.config.update after import is the reliable
override. XLA_FLAGS still applies because the backend itself initializes
lazily on first use.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compile cache. On the CPU backend this is a no-op: XLA:CPU
# cache entries are AOT code whose feature check fails even on a same-machine
# round-trip (measured; see masg_tpu/core/cache.py), so tests always compile
# fresh.
from masg_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute integration tests, opt in with MASG_SLOW_TESTS=1",
    )
    config.addinivalue_line(
        "markers",
        "tpu: needs the real TPU backend, opt in with MASG_TPU_TESTS=1",
    )
    config.addinivalue_line(
        "markers",
        "smoke: fast cross-subsystem tier — `pytest -m smoke -n 0` targets "
        "<8 min on one CPU core (README 'Running the tests')",
    )
