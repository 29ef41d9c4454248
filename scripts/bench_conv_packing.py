"""Probe: can block-Toeplitz time-packing make the narrow HiFi-GAN convs fast?

Stage 3 of the generator (C=32, T=164k) measures ~8% of MXU peak because a
32-channel conv fills 32 of the MXU's 128 output lanes. Packing p=4 time
steps into channels gives 128-lane matmuls at the cost of kernel-overlap MAC
inflation (zeros in the block-Toeplitz weight). A previous dense rewrite of
the whole vocoder LOST on silicon; this probe times the RAW lax convs at
original vs packed shapes to find where (if anywhere) packing pays before
committing to a rewrite.

Run: python scripts/bench_conv_packing.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed_conv(B, T, Cin, Cout, k, d, dtype_name="bf16", iters=30):
    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, Cin)), dtype)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(k, Cin, Cout)) * 0.01,
                    dtype)
    pad = (k * d - d) // 2

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(pad, pad)], rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"))

    @jax.jit
    def loop(x):
        def body(i, acc):
            xi = x + (i % 3).astype(x.dtype) * jnp.asarray(1e-3, x.dtype)
            return acc + jnp.sum(conv(xi).astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.asarray(0.0, jnp.float32))

    _ = np.asarray(loop(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(loop(x))
        best = min(best, time.perf_counter() - t0)
    ms = best / iters * 1e3
    tflops = 2 * B * T * k * Cin * Cout / (ms / 1e3) / 1e12
    return ms, tflops


def main():
    from masg_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    B, T, C = 16, 163840, 32
    P = 4  # pack factor: 4 x 32 = 128 lanes

    cases = [
        # (label, B, T, Cin, Cout, k, d)
        ("orig k3 d1   C32", B, T, C, C, 3, 1),
        ("pack k3 d1  C128", B, T // P, C * P, C * P, 2, 1),
        ("orig k11 d1  C32", B, T, C, C, 11, 1),
        ("pack k11 d1 C128", B, T // P, C * P, C * P, 4, 1),
        ("orig k11 d5  C32", B, T, C, C, 11, 5),
        ("pack k11 d5 C128", B, T // P, C * P, C * P, 14, 1),
        # stage 2 for reference (C=64, T=82k, pack 2)
        ("orig k11 d5  C64", B, T // 2, 64, 64, 11, 5),
        ("pack k11 d5 C128(s2)", B, T // 4, 128, 128, 7, 1),
    ]
    for label, b, t, ci, co, k, d in cases:
        ms, tf = timed_conv(b, t, ci, co, k, d)
        print(f"{label:22s}: {ms:7.3f} ms  {tf:6.1f} TFLOP/s "
              f"({100 * tf / 197:4.1f}% peak)", flush=True)


if __name__ == "__main__":
    main()
