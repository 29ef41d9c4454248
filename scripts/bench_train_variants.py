"""Measure train-step throughput under memory/HBM optimizations on the chip.

The bf16 train step is HBM-bound (BASELINE.md: 105.9 FLOP/HBM-byte vs the
~240 ridge on v5e). The big byte producers are the decoder's six quadratic
attention layers at T=896: the (B,H,T,T) probs tensors are saved for backward.
Variants:

  base        current step (saves everything XLA decides to save)
  remat       jax.checkpoint around every FFTBlock (recompute in backward)
  remat_dots  same but with the dots_saveable policy (keeps matmul outputs,
              recomputes softmax/elementwise)

Run: python scripts/bench_train_variants.py [--bf16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(cfg, example_inputs, dtype, n_steps=20, use_flash=False, B=16, T=896,
            param_storage="f32"):
    import jax
    import jax.numpy as jnp

    from masg_tpu.models import FastSpeech2
    from masg_tpu.train.optim import make_optimizer
    from masg_tpu.train.state import create_train_state
    from masg_tpu.train.step import make_train_step

    model = FastSpeech2.from_config(cfg, dtype=dtype, use_flash=use_flash)
    b = example_inputs(B=B, L=128, T=T)
    T = b["mels"].shape[1]
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["speakers"], batch["texts"], batch["src_lens"], T,
        mels=batch["mels"], mel_lens=batch["mel_lens"], p_targets=batch["pitches"],
        e_targets=batch["energies"], d_targets=batch["durations"],
        accents=batch["accents"], speaker_meta=batch["speaker_meta"],
    )
    tx = make_optimizer(cfg.train.optimizer, cfg.model.transformer.encoder_hidden,
                        param_storage=param_storage)
    if param_storage != "f32":
        variables = dict(variables)
        variables["params"] = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            variables["params"])
    state = create_train_state(model, variables, tx)
    step_fn = make_train_step(model, rng_impl="rbg")

    @jax.jit
    def loop(state, rng):
        def body(i, s):
            s2, _ = step_fn(s, batch, jax.random.fold_in(rng, i))
            return s2
        return jax.lax.fori_loop(0, n_steps, body, state)

    rng = jax.random.key(1, impl="rbg")
    out = loop(state, rng)
    _ = np.asarray(out.step)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(out, rng)
        _ = np.asarray(out.step)
        dt = min(dt, time.perf_counter() - t0)

    gflops = hbm_gb = None
    try:
        cost = jax.jit(step_fn).lower(
            state, batch, jax.random.fold_in(rng, 0)).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        gflops = float(cost.get("flops", 0.0)) / 1e9
        hbm_gb = float(cost.get("bytes accessed", 0.0)) / 1e9
    except Exception:
        pass
    return n_steps / dt, gflops, hbm_gb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f32", action="store_true", help="also run f32 variants")
    ap.add_argument("--only", default=None, help="run a single variant by name")
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--T", type=int, default=896)
    args = ap.parse_args()

    from masg_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from __graft_entry__ import _example_inputs, _flagship
    import masg_tpu.models.encoder as enc_mod
    from masg_tpu.models.layers import FFTBlock

    cfg = _flagship()
    if args.T > cfg.model.max_seq_len:
        # long-T training study: lift the decoder truncation cap
        cfg.model.max_seq_len = args.T
    dtypes = [("bf16", jnp.bfloat16)] + ([("f32", jnp.float32)] if args.f32 else [])

    variants = {
        "base": (None, False, "f32"),
        # flax nn.remat static_argnums count `self` as 0: deterministic is 4
        "remat": (nn.remat(FFTBlock, static_argnums=(4,)), False, "f32"),
        "remat_dots": (nn.remat(
            FFTBlock,
            static_argnums=(4,),
            policy=jax.checkpoint_policies.dots_saveable,
        ), False, "f32"),
        # Pallas flash fwd + custom-VJP Pallas bwd: no (T, T) in HBM either way
        "flash": (None, True, "f32"),
        # bf16 parameter storage (+ f32 master in opt state); the HBM-bound
        # step reads half the parameter bytes in fwd/bwd
        "bf16_params": (None, False, "bf16"),
        # ... and bf16 Adam moments too (least optimizer traffic)
        "bf16_params_moments": (None, False, "bf16_moments"),
    }

    orig = enc_mod.FFTBlock
    for name, dtype in dtypes:
        for vname, (cls, use_flash, pstore) in variants.items():
            if args.only and vname != args.only:
                continue
            enc_mod.FFTBlock = orig if cls is None else cls
            try:
                sps, gflops, hbm = measure(cfg, _example_inputs, dtype,
                                           use_flash=use_flash, B=args.B, T=args.T,
                                           param_storage=pstore)
                intensity = (gflops / hbm) if (gflops and hbm) else None
                print(
                    f"{name} {vname:20s}: {sps:6.2f} steps/s"
                    f"  flops={gflops:7.1f} GF  hbm={hbm:6.2f} GB"
                    f"  intensity={intensity:6.1f}"
                    if gflops else f"{name} {vname:20s}: {sps:6.2f} steps/s",
                    flush=True,
                )
            finally:
                enc_mod.FFTBlock = orig


if __name__ == "__main__":
    main()
