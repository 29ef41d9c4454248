"""Training CLI.

Drop-in equivalent of the reference's `python train.py -c <config_dir>
[--use_clf] [--restore_step N] [--checkpoint p] [--corpus A B ...]`
(train.py:296-343). Run as `python -m masg_tpu.cli.train ...`.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="experiment config directory")
    parser.add_argument("--restore_step", type=int, default=0)
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="warm-start model weights from another run's ckpt dir")
    parser.add_argument("--use_clf", action="store_true",
                        help="adversarial GE2E language discriminator branch")
    parser.add_argument("--corpus", type=str, nargs="*", default=None)
    parser.add_argument("--max_steps", type=int, default=None,
                        help="stop after N steps this invocation (smoke runs)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true", help="bfloat16 activations")
    parser.add_argument("--param_storage", default="f32",
                        choices=["f32", "bf16", "bf16_moments"],
                        help="bf16 stores parameters (and optionally Adam "
                             "moments) in bfloat16 with an f32 master copy — "
                             "halves the HBM-bound step's parameter traffic")
    parser.add_argument("--n_devices", type=int, default=None,
                        help="cap the device mesh to the first N devices (default all)")
    parser.add_argument("--n_model", type=int, default=1,
                        help="tensor-parallel axis size of the (data, model) mesh")
    parser.add_argument("--flash", action="store_true",
                        help="Pallas flash attention in the FFT blocks (TPU only)")
    parser.add_argument("--rng_impl", default="rbg",
                        choices=["threefry2x32", "rbg", "unsafe_rbg"],
                        help="dropout PRNG: rbg drives the TPU hardware "
                             "generator (+12%% step rate vs threefry)")
    parser.add_argument("--clf_featurization", default="model",
                        choices=["model", "ge2e"],
                        help="--use_clf discriminator input: 'model' = raw "
                             "predicted feature mels (reference-faithful, "
                             "incl. its featurization gap, train.py:181-184)"
                             "; 'ge2e' = in-graph change of mel basis into "
                             "the GE2E encoder's training domain (opt-in, "
                             "beyond parity)")
    parser.add_argument("--multihost", action="store_true",
                        help="jax.distributed.initialize before device use "
                             "(coordinator via MASG_COORDINATOR / "
                             "MASG_NUM_PROCESSES / MASG_PROCESS_ID, or "
                             "auto-detected on managed TPU pods)")
    args = parser.parse_args(argv)

    if args.multihost:
        from ..parallel.distributed import initialize

        initialize()

    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..core.config import load_config_dir
    from ..train.loop import build_experiment

    cfg = load_config_dir(args.config)
    trainer = build_experiment(
        cfg,
        corpora=args.corpus,
        use_clf=args.use_clf,
        restore_step=args.restore_step,
        checkpoint=args.checkpoint,
        seed=args.seed,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        n_devices=args.n_devices,
        n_model=args.n_model,
        use_flash=args.flash,
        rng_impl=args.rng_impl,
        param_storage=args.param_storage,
        clf_featurization=args.clf_featurization,
    )
    print(f"mesh: {dict(trainer.mesh.shape)}")
    n_params = sum(
        x.size for x in __import__("jax").tree.leaves(trainer.state.params)
    )
    print(f"Number of FastSpeech2 Parameters: {n_params}")
    trainer.fit(restore_step=args.restore_step, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
