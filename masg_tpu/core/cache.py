"""Persistent XLA compilation cache.

TPU compiles of the full model take minutes (the HiFi-GAN graph especially);
enabling jax's persistent cache makes second runs of every CLI start in
seconds. Called by all CLI entry points; opt out with MASG_NO_COMPILE_CACHE=1
or redirect with MASG_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "masg_tpu_xla")


def _host_fingerprint() -> str:
    """Short hash of the host CPU feature set. XLA:CPU caches AOT machine
    code compiled for the exact feature set of the compiling host; loading
    entries produced on a different machine triggers feature-mismatch
    warnings and can SIGSEGV/SIGILL (observed: a crash inside
    put_executable_and_time after foreign AOT loads). Keying the cache dir
    per host CPU keeps entries homogeneous."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = line
                    break
            else:
                feats = ""
    except OSError:
        import platform

        feats = platform.processor() + platform.machine()
    return hashlib.sha1(feats.encode()).hexdigest()[:10]


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
    import jax

    cache_dir = os.environ.get("MASG_COMPILE_CACHE_DIR", DEFAULT_DIR)
    # XLA:CPU AOT artifacts are host-CPU-specific (see _host_fingerprint);
    # TPU executables are host-agnostic and stay shared
    if _cpu_platform_selected():
        cache_dir = os.path.join(cache_dir, _host_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these knobs
