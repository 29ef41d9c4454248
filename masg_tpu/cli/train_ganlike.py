"""Adversarial (ganlike) training CLI.

Equivalent of the reference's `python train_ganlike.py -c <config_dir> ...`
(train_ganlike.py:268-315): FastSpeech2 and the GE2E language discriminator
train jointly under one optimizer with jittered language labels.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("--restore_step", type=int, default=0)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--corpus", type=str, nargs="*", default=None)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--n_devices", type=int, default=None)
    parser.add_argument("--n_model", type=int, default=1)
    parser.add_argument("--rng_impl", default="rbg",
                        choices=["threefry2x32", "rbg", "unsafe_rbg"],
                        help="dropout PRNG: rbg drives the TPU hardware "
                             "generator (+12%% step rate vs threefry)")
    parser.add_argument("--flash", action="store_true")
    args = parser.parse_args(argv)

    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..core.config import load_config_dir
    from ..train.loop import build_experiment

    cfg = load_config_dir(args.config)
    trainer = build_experiment(
        cfg,
        corpora=args.corpus,
        ganlike=True,
        restore_step=args.restore_step,
        checkpoint=args.checkpoint,
        seed=args.seed,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        n_devices=args.n_devices,
        n_model=args.n_model,
        use_flash=args.flash,
        rng_impl=args.rng_impl,
    )
    n_params = sum(
        x.size for x in __import__("jax").tree.leaves(trainer.state.params)
    )
    print(f"Number of GANLike Parameters: {n_params}")
    trainer.fit(restore_step=args.restore_step, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
