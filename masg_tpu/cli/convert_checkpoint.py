"""Convert a reference torch FastSpeech2 checkpoint into our orbax format.

Usage:
  python -m masg_tpu.cli.convert_checkpoint -c <config_dir> \
      --torch_ckpt path/to/20000.pth.tar --step 20000

After conversion the experiment's ckpt_path holds the weights and every CLI
accepts `--restore_step 20000` against it. Forward parity of the mapping is
proven in tests/test_torch_parity.py.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("--torch_ckpt", type=str, required=True)
    parser.add_argument("--step", type=int, required=True,
                        help="step label for the converted checkpoint")
    parser.add_argument("--out", type=str, default=None,
                        help="ckpt dir (default: the experiment's ckpt_path)")
    args = parser.parse_args(argv)

    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from ..compat.torch_fs2 import load_torch_checkpoint
    from ..core.checkpoint import CheckpointManager
    from ..core.config import load_config_dir
    from ..models import FastSpeech2
    from ..train.optim import make_optimizer
    from ..train.state import create_train_state

    cfg = load_config_dir(args.config)
    params, batch_stats = load_torch_checkpoint(
        args.torch_ckpt,
        encoder_layers=cfg.model.transformer.encoder_layer,
        decoder_layers=cfg.model.transformer.decoder_layer,
        multi_speaker=cfg.model.multi_speaker,
    )

    # build a fresh state via load_model (handles the jdit/frame-level init
    # branches), then graft the converted weights with a structure check
    from ..infer.synthesis import load_model

    model, variables = load_model(cfg, restore_step=0)
    import flax

    init_params = flax.core.unfreeze(variables["params"])
    if jax.tree_util.tree_structure(init_params) != jax.tree_util.tree_structure(params):
        init_keys = set(init_params)
        conv_keys = set(params)
        raise ValueError(
            "converted param tree does not match this config's model: "
            f"missing={sorted(init_keys - conv_keys)} "
            f"extra={sorted(conv_keys - init_keys)} — check the config's "
            "encoder/decoder layer counts and jdit/multi_speaker settings "
            "(jdit teacher weights cannot be converted from the reference's "
            "FastSpeech2-only checkpoints)"
        )
    tx = make_optimizer(cfg.train.optimizer, cfg.model.transformer.encoder_hidden)
    state = create_train_state(model, variables, tx)
    state = state.replace(
        params=jax.tree.map(jnp.asarray, params),
        batch_stats=jax.tree.map(jnp.asarray, batch_stats),
    )

    mgr = CheckpointManager(args.out or cfg.train.path.ckpt_path)
    mgr.save(args.step, state)
    print(f"converted {args.torch_ckpt} -> {mgr.ckpt_dir} @ step {args.step}")


if __name__ == "__main__":
    main()
