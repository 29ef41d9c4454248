"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: text->mel synthesis throughput (mel frames/sec/chip) through
the full FastSpeech2 stack on the real chip. The reference publishes no
numbers (BASELINE.md), so vs_baseline is measured against the driver's
north-star: 50x realtime at 22050 Hz / hop 256 (= 4306.6 frames/s).

Methodology note: this TPU is reached through a relay tunnel with ~20ms
per-dispatch latency and a block_until_ready that does not actually block, so
iterations run inside ONE jitted lax.fori_loop (inputs perturbed per iteration
to defeat loop-invariant hoisting) and the result is synced with a host fetch.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REALTIME_FRAMES_PER_SEC = 22050.0 / 256.0  # mel frame rate of the audio config
NORTH_STAR_X = 50.0  # >= 50x realtime on one chip (BASELINE.md)
N_ITERS = 30


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_inputs, _flagship
    from masg_tpu.models import FastSpeech2

    B, L, T = 8, 128, 1000
    cfg = _flagship()
    model = FastSpeech2.from_config(cfg, dtype=jnp.bfloat16)
    b = _example_inputs(B=B, L=L, T=T)

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b["speakers"]), jnp.asarray(b["texts"]),
        jnp.asarray(b["src_lens"]), T,
        mel_lens=jnp.asarray(b["mel_lens"]), p_targets=jnp.asarray(b["pitches"]),
        e_targets=jnp.asarray(b["energies"]), d_targets=jnp.asarray(b["durations"]),
        accents=jnp.asarray(b["accents"]), speaker_meta=jnp.asarray(b["speaker_meta"]),
    )

    texts0 = jnp.asarray(b["texts"])
    text_valid = (texts0 > 0).astype(texts0.dtype)

    # duration-driven synthesis: same compute shape as free-running inference
    @jax.jit
    def synth_loop(variables, speakers, texts, src_lens, durations, accents, meta):
        def body(i, carry):
            acc, frames = carry
            # perturb ids per iteration so XLA cannot hoist the computation
            t = jnp.clip(texts + (i % 3) * text_valid, 0, 400)
            s = (speakers + i) % 16
            out = model.apply(
                variables, s, t, src_lens, T,
                d_targets=durations, accents=accents, speaker_meta=meta,
            )
            return acc + jnp.sum(out.postnet_mel.astype(jnp.float32)), frames + jnp.sum(out.mel_len)

        return jax.lax.fori_loop(
            0, N_ITERS, body, (jnp.asarray(0.0, jnp.float32), jnp.asarray(0, jnp.int32))
        )

    args = (
        variables,
        jnp.asarray(b["speakers"]), texts0,
        jnp.asarray(b["src_lens"]), jnp.asarray(b["durations"]),
        jnp.asarray(b["accents"]), jnp.asarray(b["speaker_meta"]),
    )

    acc, frames = synth_loop(*args)
    _ = np.asarray(acc)  # compile + full sync (host fetch — see note above)

    t0 = time.perf_counter()
    acc, frames = synth_loop(*args)
    total_frames = int(np.asarray(frames))  # host fetch = true barrier
    dt = time.perf_counter() - t0

    frames_per_sec = total_frames / dt
    x_realtime = frames_per_sec / REALTIME_FRAMES_PER_SEC

    print(json.dumps({
        "metric": "text2mel_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "mel_frames/s",
        "vs_baseline": round(x_realtime / NORTH_STAR_X, 3),
    }))


if __name__ == "__main__":
    main()
