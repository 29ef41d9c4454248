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
