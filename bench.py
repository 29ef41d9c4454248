"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: END-TO-END text->wav real-time factor through the full stack
(FastSpeech2 synthesis + HiFi-GAN vocoding, bf16) on the real chip.
vs_baseline is measured against the driver's north-star of >= 50x realtime on
one v5e chip (BASELINE.md; the reference itself publishes no numbers).

Methodology: this TPU sits behind a relay tunnel with ~20ms per-dispatch
latency and a block_until_ready that does not actually block, so iterations
run inside ONE jitted lax.fori_loop (inputs perturbed per iteration to defeat
loop-invariant hoisting) and the result is synced with a host fetch.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SAMPLE_RATE = 22050
HOP = 256
NORTH_STAR_X = 50.0  # >= 50x realtime end-to-end on one chip (BASELINE.md)
N_ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_inputs, _flagship
    from masg_tpu.models import FastSpeech2
    from masg_tpu.models.hifigan import HiFiGANGenerator

    B, L, T = 8, 128, 512
    cfg = _flagship()
    model = FastSpeech2.from_config(cfg, dtype=jnp.bfloat16)
    voc = HiFiGANGenerator(dtype=jnp.bfloat16)
    b = _example_inputs(B=B, L=L, T=T)

    fs2_vars = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b["speakers"]), jnp.asarray(b["texts"]),
        jnp.asarray(b["src_lens"]), T,
        mel_lens=jnp.asarray(b["mel_lens"]), p_targets=jnp.asarray(b["pitches"]),
        e_targets=jnp.asarray(b["energies"]), d_targets=jnp.asarray(b["durations"]),
        accents=jnp.asarray(b["accents"]), speaker_meta=jnp.asarray(b["speaker_meta"]),
    )
    voc_vars = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 80), jnp.bfloat16))

    texts0 = jnp.asarray(b["texts"])
    text_valid = (texts0 > 0).astype(texts0.dtype)

    @jax.jit
    def e2e_loop(fs2_vars, voc_vars, speakers, texts, src_lens, durations, accents, meta):
        def body(i, carry):
            acc, frames = carry
            # perturb inputs per iteration so XLA cannot hoist the computation
            t = jnp.clip(texts + (i % 3) * text_valid, 0, 400)
            out = model.apply(
                fs2_vars, (speakers + i) % 16, t, src_lens, T,
                d_targets=durations, accents=accents, speaker_meta=meta,
            )
            wav = voc.apply(voc_vars, out.postnet_mel.astype(jnp.bfloat16))
            return acc + jnp.sum(wav.astype(jnp.float32)), frames + jnp.sum(out.mel_len)

        return jax.lax.fori_loop(
            0, N_ITERS, body, (jnp.asarray(0.0, jnp.float32), jnp.asarray(0, jnp.int32))
        )

    args = (
        fs2_vars, voc_vars,
        jnp.asarray(b["speakers"]), texts0, jnp.asarray(b["src_lens"]),
        jnp.asarray(b["durations"]), jnp.asarray(b["accents"]),
        jnp.asarray(b["speaker_meta"]),
    )

    acc, frames = e2e_loop(*args)
    _ = np.asarray(acc)  # compile + true barrier (host fetch)

    t0 = time.perf_counter()
    acc, frames = e2e_loop(*args)
    total_frames = int(np.asarray(frames))
    dt = time.perf_counter() - t0

    audio_seconds = total_frames * HOP / SAMPLE_RATE
    rtf = audio_seconds / dt

    print(json.dumps({
        "metric": "text2wav_rtf_per_chip",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / NORTH_STAR_X, 3),
    }))


if __name__ == "__main__":
    main()
