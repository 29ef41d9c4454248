"""Persistent XLA compilation cache.

TPU compiles of the full model take minutes (the HiFi-GAN graph especially);
enabling jax's persistent cache makes second runs of every CLI start in
seconds. Called by all CLI entry points; opt out with MASG_NO_COMPILE_CACHE=1
or redirect with MASG_COMPILE_CACHE_DIR.

XLA:CPU is excluded unconditionally: its cache entries are AOT machine code
stamped with the compile-time LLVM target features, and the loader
(cpu_aot_loader.cc:210) compares that list against the *detected host CPU
features* — which never include XLA's own tuning pseudo-features
(+prefer-no-gather/+prefer-no-scatter). Measured on this image (jax 0.9.0):
a SAME-MACHINE write→read round-trip fails the check, logs the
feature-mismatch error, and recompiles from scratch, so a CPU persistent
cache is pure overhead (and cross-machine loads have SIGSEGV'd). There is no
jax-level off switch for the AOT payload (jax_persistent_cache_enable_xla_caches
governs auxiliary caches only — verified ineffective here), hence: the cache
exists for TPU compile times, CPU always compiles fresh, no opt-in.
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
    if _cpu_platform_selected():
        return  # see module docstring: XLA:CPU AOT entries never load back
    import jax

    cache_dir = os.environ.get("MASG_COMPILE_CACHE_DIR", DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these knobs
