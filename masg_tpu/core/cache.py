"""Persistent XLA compilation cache.

TPU compiles of the full model take minutes (the HiFi-GAN graph especially);
enabling jax's persistent cache makes second runs of every CLI start in
seconds. Called by all CLI entry points; opt out with MASG_NO_COMPILE_CACHE=1
or redirect with MASG_COMPILE_CACHE_DIR.

XLA:CPU is excluded by default: its cache entries are AOT machine code
compiled for the exact CPU feature set XLA detected on the *compiling* host
(including XLA-internal target-feature choices like +prefer-no-gather that no
/proc/cpuinfo fingerprint captures), so entries written on one machine
feature-mismatch — and have SIGSEGV'd — when loaded on another. The cache
exists for TPU compile times; CPU runs always compile fresh unless
MASG_CPU_COMPILE_CACHE=1 opts in for a guaranteed-same-machine workflow
(e.g. repeated local test runs).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "masg_tpu_xla")


def _cpu_platform_selected() -> bool:
    """True when jax will run on the CPU backend (config override or env),
    WITHOUT initializing the backend."""
    import jax

    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    first = str(plats).split(",")[0].strip().lower()
    return first == "cpu"


def enable_compilation_cache() -> None:
    if os.environ.get("MASG_NO_COMPILE_CACHE") == "1":
        return
    if (_cpu_platform_selected()
            and os.environ.get("MASG_CPU_COMPILE_CACHE") != "1"):
        return  # see module docstring: CPU AOT entries are host-specific
    import jax

    cache_dir = os.environ.get("MASG_COMPILE_CACHE_DIR", DEFAULT_DIR)
    if _cpu_platform_selected():
        # opt-in CPU cache: keep CPU entries out of the shared TPU dir so a
        # later TPU run never scans them
        cache_dir = os.path.join(cache_dir, "cpu")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these knobs
