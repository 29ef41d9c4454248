"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline: END-TO-END text->wav real-time factor through the full stack on the
real chip — FastSpeech2 *free-running* synthesis (durations PREDICTED by the
model, the true inference path, reference synthesize.py:104-131 passes no
targets) + HiFi-GAN vocoding, bf16. vs_baseline is measured against the
driver's north-star of >= 50x realtime on one v5e chip (BASELINE.md; the
reference itself publishes no numbers).

`extra` carries the secondary metrics VERDICT r1 asked for:
  - text2mel_frames_per_s: model-only throughput at the T=1000 bucket cap
  - train_steps_per_s: full jitted train step, 35M-param config, f32, bs 16
  - attn_xla_ms / attn_flash_ms @ T=1000: XLA attention vs the Pallas flash
    kernel lowered through Mosaic on the real chip, and which one wins

Untrained weights predict round(exp(0)-1)=0 durations, so the duration
predictor's output bias is set to ln(5) (~4 frames/phone after rounding,
realistic speech rate); the compute driven is exactly the trained-model path.

Methodology: this TPU sits behind a relay tunnel with ~20ms per-dispatch
latency and a block_until_ready that does not actually block, so iterations
run inside ONE jitted lax.fori_loop (inputs perturbed per iteration to defeat
loop-invariant hoisting) and the result is synced with a host fetch.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SAMPLE_RATE = 22050
HOP = 256
NORTH_STAR_X = 50.0  # >= 50x realtime end-to-end on one chip (BASELINE.md)
N_ITERS = 10


def _with_duration_bias(fs2_vars, value: float):
    """Shared helper: masg_tpu.infer.serving.with_duration_bias."""
    from masg_tpu.infer.serving import with_duration_bias

    return with_duration_bias(fs2_vars, value)


def bench_e2e_and_text2mel(model, voc, fs2_vars, voc_vars, b, T_mel):
    """Free-running text->mel->wav loop; returns (rtf, frames_per_s)."""
    import jax
    import jax.numpy as jnp

    texts0 = jnp.asarray(b["texts"])
    text_valid = (texts0 > 0).astype(texts0.dtype)
    speakers = jnp.asarray(b["speakers"])
    src_lens = jnp.asarray(b["src_lens"])
    accents = jnp.asarray(b["accents"])
    meta = jnp.asarray(b["speaker_meta"])

    def fwd(fs2_vars, i, max_len):
        # perturb inputs per iteration so XLA cannot hoist the computation
        t = jnp.clip(texts0 + (i % 3) * text_valid, 0, 400)
        return model.apply(
            fs2_vars, (speakers + i) % 16, t, src_lens, max_len,
            accents=accents, speaker_meta=meta,
        )

    @jax.jit
    def e2e_loop(fs2_vars, voc_vars):
        def body(i, carry):
            acc, frames = carry
            out = fwd(fs2_vars, i, T_mel)
            wav = voc.apply(voc_vars, out.postnet_mel.astype(jnp.bfloat16))
            return acc + jnp.sum(wav.astype(jnp.float32)), frames + jnp.sum(out.mel_len)

        return jax.lax.fori_loop(
            0, N_ITERS, body, (jnp.asarray(0.0, jnp.float32), jnp.asarray(0, jnp.int32))
        )

    @jax.jit
    def mel_loop(fs2_vars):
        def body(i, carry):
            acc, frames = carry
            out = fwd(fs2_vars, i, 1000)  # max_seq_len bucket cap
            return acc + jnp.sum(out.postnet_mel.astype(jnp.float32)), \
                frames + jnp.sum(out.mel_len)

        return jax.lax.fori_loop(
            0, N_ITERS, body, (jnp.asarray(0.0, jnp.float32), jnp.asarray(0, jnp.int32))
        )

    def best_of(loop_fn, *args, n=3):
        """Best (min) wall time over n timed runs after a warmup run — the
        tunnel adds multi-ms scheduling jitter that only shows as slowdown."""
        acc, frames = loop_fn(*args)
        _ = np.asarray(acc)  # compile + true barrier (host fetch)
        best = float("inf")
        for _i in range(n):
            t0 = time.perf_counter()
            acc, frames = loop_fn(*args)
            total_frames = int(np.asarray(frames))
            best = min(best, time.perf_counter() - t0)
        return total_frames, best

    total_frames, dt = best_of(e2e_loop, fs2_vars, voc_vars)
    assert total_frames > 0, "free-running path produced zero frames"
    rtf = (total_frames * HOP / SAMPLE_RATE) / dt

    total_frames, dt = best_of(mel_loop, fs2_vars)
    frames_per_s = total_frames / dt
    return rtf, frames_per_s


def bench_train_step(cfg, example_inputs, dtype=None):
    """Full jitted train step (35M config, bs 16): steps/s.
    dtype=None -> f32 (reference precision); bfloat16 -> the mixed-precision
    recipe (bf16 compute, f32 params; tests/test_train_step.py parity)."""
    import jax
    import jax.numpy as jnp

    from masg_tpu.models import FastSpeech2
    from masg_tpu.train.optim import make_optimizer
    from masg_tpu.train.state import create_train_state
    from masg_tpu.train.step import make_train_step

    model = FastSpeech2.from_config(cfg, dtype=dtype or jnp.float32)
    b = example_inputs(B=16, L=128, T=896)
    T = b["mels"].shape[1]
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["speakers"], batch["texts"], batch["src_lens"], T,
        mels=batch["mels"], mel_lens=batch["mel_lens"], p_targets=batch["pitches"],
        e_targets=batch["energies"], d_targets=batch["durations"],
        accents=batch["accents"], speaker_meta=batch["speaker_meta"],
    )
    tx = make_optimizer(cfg.train.optimizer, cfg.model.transformer.encoder_hidden)
    state = create_train_state(model, variables, tx)
    # rbg dropout RNG = the production trainer default (train/loop.py)
    step_fn = make_train_step(model, rng_impl="rbg")

    N_STEPS = 20

    @jax.jit
    def loop(state, rng):
        def body(i, s):
            s2, _ = step_fn(s, batch, jax.random.fold_in(rng, i))
            return s2
        return jax.lax.fori_loop(0, N_STEPS, body, state)

    rng = jax.random.key(1, impl="rbg")
    out = loop(state, rng)
    _ = np.asarray(out.step)  # compile + barrier
    dt = float("inf")
    for _i in range(3):  # best-of-3: tunnel jitter only slows, never speeds
        t0 = time.perf_counter()
        out = loop(out, rng)
        _ = np.asarray(out.step)
        dt = min(dt, time.perf_counter() - t0)

    # XLA cost analysis of ONE train step: FLOPs + HBM bytes -> MFU and
    # arithmetic intensity (VERDICT r1 item 5: publish the utilization story,
    # don't leave the bs-16 saturation a mystery)
    gflops = hbm_gb = None
    try:
        cost = jax.jit(step_fn).lower(
            state, batch, jax.random.fold_in(rng, 0)).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        gflops = float(cost.get("flops", 0.0)) / 1e9
        hbm_gb = float(cost.get("bytes accessed", 0.0)) / 1e9
    except Exception:
        pass  # cost analysis is backend-dependent; throughput still reports
    return N_STEPS / dt, gflops, hbm_gb


def bench_vocoder_train(n_steps=10, bs=16, seg=8192):
    """Full upstream-V1 HiFi-GAN GAN train step (G + MPD + MSD + mel/fm
    losses, both optimizers) at the upstream batch/segment: steps/s.
    VERDICT r3 item 2: the number that budgets wall-time-to-audible."""
    import jax
    import jax.numpy as jnp

    from masg_tpu.infer.vocoder import DEFAULT_HIFIGAN_CONFIG
    from masg_tpu.models.hifigan import HiFiGANGenerator
    from masg_tpu.models.hifigan_disc import build_discriminators
    from masg_tpu.train.vocoder import (init_vocoder_train_state,
                                        make_vocoder_train_step)

    cfg = dict(DEFAULT_HIFIGAN_CONFIG)
    cfg.update({"segment_size": seg, "learning_rate": 2e-4, "adam_b1": 0.8,
                "adam_b2": 0.99, "lr_decay": 0.999})
    gen = HiFiGANGenerator(
        n_mels=cfg["num_mels"],
        upsample_rates=tuple(cfg["upsample_rates"]),
        upsample_kernel_sizes=tuple(cfg["upsample_kernel_sizes"]),
        upsample_initial_channel=cfg["upsample_initial_channel"],
        resblock_kernel_sizes=tuple(cfg["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in cfg["resblock_dilation_sizes"]))
    mpd, msd = build_discriminators(cfg)
    state, (gen_tx, disc_tx) = init_vocoder_train_state(
        gen, mpd, msd, cfg, steps_per_epoch=1000, rng=jax.random.PRNGKey(0))
    step_fn = make_vocoder_train_step(gen, mpd, msd, gen_tx, disc_tx, cfg)
    audio = jnp.asarray(
        0.1 * np.sin(np.linspace(0, 3000, bs * seg)).reshape(bs, seg)
        .astype(np.float32))

    @jax.jit
    def loop(state):
        def body(i, s):
            s2, _ = step_fn(s, audio)
            return s2
        return jax.lax.fori_loop(0, n_steps, body, state)

    out = loop(state)
    _ = np.asarray(out.step)  # compile + barrier
    dt = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        out = loop(out)
        _ = np.asarray(out.step)
        dt = min(dt, time.perf_counter() - t0)
    return n_steps / dt


def bench_attention(T=1000, B=8, H=2, Dh=128, iters=30):
    """XLA attention vs Pallas flash kernel at the max_seq_len bucket."""
    import jax
    import jax.numpy as jnp

    from masg_tpu.ops.attention import flash_attention, mha_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.bfloat16)
    lens = jnp.asarray(rng.integers(T - 200, T + 1, size=(B,)), jnp.int32)
    pad = jnp.arange(T)[None, :] >= lens[:, None]

    def timed(fn):
        @jax.jit
        def loop(q, k, v):
            def body(i, acc):
                qi = q + (i % 3).astype(q.dtype) * 1e-3
                return acc + jnp.sum(fn(qi, k, v).astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.asarray(0.0, jnp.float32))

        _ = np.asarray(loop(q, k, v))
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(loop(q, k, v))
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1e3  # ms per call

    t_xla = timed(lambda q, k, v: mha_attention(q, k, v, pad))
    t_flash = timed(lambda q, k, v: flash_attention(q, k, v, lens))
    return t_xla, t_flash


def bench_streaming_latency(voc, voc_vars, T_mel=640, chunk=192, ctx=24, n=5):
    """First-audio latency: one receptive-field-exact vocoder window
    (infer.vocoder.vocode_streaming) vs vocoding the full utterance.
    Host-fetch included on both sides (the chunks ARE host arrays)."""
    import numpy as np

    import jax.numpy as jnp

    from masg_tpu.infer.vocoder import Vocoder, vocode_streaming

    v = Vocoder(voc, voc_vars["params"])
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(1, T_mel, 80)).astype(np.float32))
    # warm every window shape + the full-length vocode (fetched)
    _ = [c.sum() for c in vocode_streaming(v, mel, chunk, ctx)]
    _ = np.asarray(v(mel)).ravel()[:1]

    first = full = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        next(vocode_streaming(v, mel, chunk, ctx))  # yields a host array
        first = min(first, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = np.asarray(v(mel)).ravel()[:1]
        full = min(full, time.perf_counter() - t0)
    return first * 1e3, full * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from masg_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()  # ~20 min of Mosaic/XLA compiles on cold runs

    from __graft_entry__ import _example_inputs, _flagship
    from masg_tpu.models import FastSpeech2
    from masg_tpu.models.hifigan import HiFiGANGenerator

    # B=16: throughput-optimal batching (measured: 962x at B=8, 1024x at
    # B=16, 1042x at B=32 — knee at 16, and it matches the training bs)
    B, L, T_mel = 16, 128, 640
    cfg = _flagship()
    model = FastSpeech2.from_config(cfg, dtype=jnp.bfloat16)
    voc = HiFiGANGenerator(dtype=jnp.bfloat16)
    b = _example_inputs(B=B, L=L, T=T_mel)

    fs2_vars = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b["speakers"]), jnp.asarray(b["texts"]),
        jnp.asarray(b["src_lens"]), T_mel,
        accents=jnp.asarray(b["accents"]), speaker_meta=jnp.asarray(b["speaker_meta"]),
    )
    fs2_vars = _with_duration_bias(fs2_vars, math.log(5.0))
    voc_vars = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 80), jnp.bfloat16))

    rtf, frames_per_s = bench_e2e_and_text2mel(model, voc, fs2_vars, voc_vars, b, T_mel)
    steps_per_s, gflops_f32, hbm_f32 = bench_train_step(cfg, _example_inputs)
    steps_per_s_bf16, gflops_bf16, hbm_bf16 = bench_train_step(
        cfg, _example_inputs, dtype=jnp.bfloat16)
    attn_xla_ms, attn_flash_ms = bench_attention(T=1000)
    attn_xla_4k, attn_flash_4k = bench_attention(T=4000, iters=20)

    stream_first_ms = vocode_full_ms = None
    try:
        stream_first_ms, vocode_full_ms = bench_streaming_latency(voc, voc_vars)
    except Exception as e:  # fail soft: never take the headline metric down
        import sys as _sys

        print(f"# streaming latency bench skipped: {e}", file=_sys.stderr)

    voc_train_steps_per_s = None
    try:
        voc_train_steps_per_s = bench_vocoder_train()
    except Exception as e:  # fail soft
        import sys as _sys

        print(f"# vocoder train bench skipped: {e}", file=_sys.stderr)

    # v5e peak: 197 TFLOP/s bf16 (public spec); MFU = achieved/peak
    V5E_PEAK_BF16 = 197e12
    mfu = tflops = intensity = None
    if gflops_bf16:
        tflops = gflops_bf16 * 1e9 * steps_per_s_bf16 / 1e12
        mfu = 100.0 * tflops * 1e12 / V5E_PEAK_BF16
        if hbm_bf16:
            # FLOP/byte vs the ~matmul-bound ridge (~240 on v5e: 197e12 /
            # 819GB/s): below it the step is HBM-bound -> bigger batches
            # can't help, which is exactly the measured bs-16 saturation
            intensity = gflops_bf16 * 1e9 / (hbm_bf16 * 1e9)

    print(json.dumps({
        "metric": "text2wav_rtf_per_chip_freerun",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / NORTH_STAR_X, 3),
        "extra": {
            "text2mel_frames_per_s": round(frames_per_s),
            "train_steps_per_s": round(steps_per_s, 2),
            "train_steps_per_s_bf16": round(steps_per_s_bf16, 2),
            "train_step_gflops": round(gflops_bf16, 1) if gflops_bf16 else None,
            "train_tflops_per_s_bf16": round(tflops, 1) if tflops else None,
            "train_mfu_pct_bf16": round(mfu, 1) if mfu else None,
            "train_flop_per_hbm_byte": round(intensity, 1) if intensity else None,
            "attn_xla_ms_T1000": round(attn_xla_ms, 3),
            "attn_flash_ms_T1000": round(attn_flash_ms, 3),
            "attn_winner_T1000": "flash" if attn_flash_ms < attn_xla_ms else "xla",
            "attn_xla_ms_T4000": round(attn_xla_4k, 3),
            "attn_flash_ms_T4000": round(attn_flash_4k, 3),
            "attn_winner_T4000": "flash" if attn_flash_4k < attn_xla_4k else "xla",
            "stream_first_audio_ms": round(stream_first_ms, 2)
            if stream_first_ms is not None else None,
            "vocode_full_640f_ms": round(vocode_full_ms, 2)
            if vocode_full_ms is not None else None,
            # upstream-V1 GAN step, bs 16 x 8192 samples = 5.94 s audio/step
            "vocoder_gan_train_steps_per_s": round(voc_train_steps_per_s, 2)
            if voc_train_steps_per_s is not None else None,
        },
    }))


if __name__ == "__main__":
    main()
