"""Per-stage timing of the HiFi-GAN generator on the real chip.

The e2e headline is vocoder-dominated (text2mel alone runs ~6.6kx realtime vs
~1025x e2e), so this breaks the generator into its pipeline stages and times
each at the B=16, T_mel=640 bench shape to find where the time actually goes:

  conv_pre            (B, 640, 80)    -> 512 ch
  up0 + 3 resblocks   (B, 5120, 256)
  up1 + 3 resblocks   (B, 40960, 128)
  up2 + 3 resblocks   (B, 81920, 64)
  up3 + 3 resblocks   (B, 163840, 32)
  conv_post + tanh    (B, 163840, 32) -> 1

Each stage runs in its own jitted fori loop (input perturbed per iteration,
host fetch as the barrier) — the tunnel methodology from bench.py.

Run: python scripts/bench_vocoder_stages.py [--B 16] [--T 640]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, x, iters=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x):
        def body(i, acc):
            xi = x + (i % 3).astype(x.dtype) * jnp.asarray(1e-3, x.dtype)
            return acc + jnp.sum(fn(xi).astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.asarray(0.0, jnp.float32))

    _ = np.asarray(loop(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(loop(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--T", type=int, default=640)
    args = ap.parse_args()

    from masg_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from masg_tpu.models.hifigan import HiFiGANGenerator, ResBlock, conv1d, \
        conv_transpose1d

    dtype = jnp.bfloat16
    voc = HiFiGANGenerator(dtype=dtype)
    mel = jnp.asarray(np.random.default_rng(0).normal(
        size=(args.B, args.T, 80)), dtype)
    variables = voc.init(jax.random.PRNGKey(1), mel[:1, :16])
    p = variables["params"]

    rates = voc.upsample_rates
    kernels = voc.upsample_kernel_sizes
    ch0 = voc.upsample_initial_channel

    total_ms = timed(lambda m: voc.apply(variables, m), mel)
    audio_s = args.B * args.T * 256 / 22050.0
    print(f"full generator: {total_ms:7.2f} ms  "
          f"vocoder-only RTF {audio_s * 1e3 / total_ms:6.0f}x", flush=True)

    # conv_pre
    ms = timed(lambda m: conv1d(m, p["conv_pre_kernel"], p["conv_pre_bias"], 3), mel)
    print(f"conv_pre        : {ms:7.2f} ms", flush=True)

    t = args.T
    for i, (u, k) in enumerate(zip(rates, kernels)):
        in_ch = ch0 // (2 ** i)
        out_ch = ch0 // (2 ** (i + 1))
        x = jnp.asarray(np.random.default_rng(i).normal(
            size=(args.B, t, in_ch)), dtype)
        ms_up = timed(
            lambda xx, i=i, u=u, k=k: conv_transpose1d(
                xx, p[f"ups_{i}_kernel"], p[f"ups_{i}_bias"], u, (k - u) // 2),
            x,
        )
        t *= u
        y = jnp.asarray(np.random.default_rng(10 + i).normal(
            size=(args.B, t, out_ch)), dtype)

        pack = max(1, 128 // out_ch) if out_ch < 128 else 1

        def res_stage(yy, i=i, out_ch=out_ch, pack=1):
            from masg_tpu.models.hifigan import pack_time, unpack_time
            if pack > 1:
                yy = pack_time(yy, pack)
            xs = None
            for j, (rk, rd) in enumerate(zip(voc.resblock_kernel_sizes,
                                             voc.resblock_dilation_sizes)):
                r = ResBlock(out_ch, rk, tuple(rd), dtype, pack).apply(
                    {"params": p[f"resblock_{i}_{j}"]}, yy)
                xs = r if xs is None else xs + r
            xs = xs / 3
            return unpack_time(xs, pack) if pack > 1 else xs

        ms_res = timed(res_stage, y)
        ms_packed = (timed(lambda yy: res_stage(yy, pack=pack), y)
                     if pack > 1 else ms_res)
        print(f"stage {i} (T={t:6d}, C={out_ch:3d}): up {ms_up:7.2f} ms   "
              f"res {ms_res:7.2f} ms   res_packed(p={pack}) {ms_packed:7.2f} ms",
              flush=True)

    ms = timed(
        lambda xx: jnp.tanh(conv1d(jax.nn.leaky_relu(xx, 0.1),
                                   p["conv_post_kernel"], p["conv_post_bias"], 3)),
        jnp.asarray(np.random.default_rng(99).normal(
            size=(args.B, t, ch0 // (2 ** len(rates)))), dtype),
    )
    print(f"conv_post       : {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
