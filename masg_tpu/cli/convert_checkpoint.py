"""Convert checkpoints between the reference torch format and our orbax
format — in BOTH directions, including the optimizer's Adam moments, so a
half-trained run can migrate either way and continue exactly.

Usage:
  # reference -> masg_tpu (weights + Adam moments when present)
  python -m masg_tpu.cli.convert_checkpoint -c <config_dir> \
      --torch_ckpt path/to/20000.pth.tar --step 20000

  # masg_tpu -> reference (strict-loadable {"model","optimizer"} .pth.tar)
  python -m masg_tpu.cli.convert_checkpoint -c <config_dir> \
      --step 20000 --to_torch out/20000.pth.tar

After forward conversion the experiment's ckpt_path holds the weights and
every CLI accepts `--restore_step 20000` against it. Forward parity of the
mapping is proven in tests/test_torch_parity.py; trajectory continuity of a
full round trip in test_torch_train_parity.py
(test_mid_training_migration_round_trip); the exported order/buffers in
tests/test_torch_export.py.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("--torch_ckpt", type=str, default=None)
    parser.add_argument("--step", type=int, required=True,
                        help="step label for the converted checkpoint")
    parser.add_argument("--out", type=str, default=None,
                        help="ckpt dir (default: the experiment's ckpt_path)")
    parser.add_argument("--to_torch", type=str, default=None,
                        help="write a reference-format .pth.tar to this path "
                             "from the orbax checkpoint at --step instead")
    parser.add_argument("--skip_optimizer", action="store_true",
                        help="convert weights only (no Adam moments)")
    parser.add_argument("--ganlike", action="store_true",
                        help="the checkpoint is from the adversarial "
                             "(ganlike) trainer: nested {model,discriminator}"
                             " params + joint optimizer")
    args = parser.parse_args(argv)
    if (args.torch_ckpt is None) == (args.to_torch is None):
        parser.error("exactly one of --torch_ckpt / --to_torch is required")

    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from ..core.checkpoint import CheckpointManager
    from ..core.config import load_config_dir
    from ..models import FastSpeech2
    from ..train.optim import make_optimizer
    from ..train.state import create_train_state

    cfg = load_config_dir(args.config)

    if args.to_torch:
        import numpy as np
        import torch

        from ..compat.torch_fs2 import (export_torch_checkpoint,
                                        export_torch_ganlike_checkpoint)
        from ..infer.synthesis import load_model

        model, variables = load_model(cfg, restore_step=0)
        if args.ganlike:
            # mirror build_experiment's nested ganlike state (train/loop.py)
            from ..models.speaker_encoder import SpeechEmbedder

            # fresh-init discriminator dims come from model.yaml, exactly
            # like build_experiment's no-discriminator_path branch
            disc = SpeechEmbedder(n_mels=cfg.preprocess.mel.n_mel_channels,
                                  hidden=cfg.model.discriminator.hidden)
            disc_params = disc.init(
                jax.random.PRNGKey(0),
                jnp.zeros((2, 150, cfg.preprocess.mel.n_mel_channels)),
            )["params"]
            variables = {
                "params": {"model": variables["params"],
                           "discriminator": disc_params},
                "batch_stats": variables.get("batch_stats", {}),
            }
            tx = make_optimizer(cfg.train.optimizer,
                                cfg.model.transformer.encoder_hidden,
                                clip_subtree="model",
                                torch_lstm_bias_compat=True)
        else:
            tx = make_optimizer(cfg.train.optimizer,
                                cfg.model.transformer.encoder_hidden)
        state = create_train_state(model, variables, tx)
        mgr = CheckpointManager(args.out or cfg.train.path.ckpt_path)
        try:
            state = mgr.restore(args.step, state)
        except Exception as e:
            raise SystemExit(
                f"checkpoint restore failed: {e}\n(If this checkpoint came "
                f"from the ganlike trainer, pass --ganlike; plain and "
                f"ganlike checkpoints have different state structures.)")
        if args.ganlike:
            ckpt = export_torch_ganlike_checkpoint(
                state.params, state.batch_stats, cfg,
                opt_state=None if args.skip_optimizer else state.opt_state,
                disc_n_layers=disc.n_layers)
        else:
            ckpt = export_torch_checkpoint(
                state.params, state.batch_stats, cfg,
                opt_state=None if args.skip_optimizer else state.opt_state)
        import os as _os

        out_dir = _os.path.dirname(args.to_torch)
        if out_dir:
            _os.makedirs(out_dir, exist_ok=True)
        payload = {"model": {n: torch.as_tensor(np.ascontiguousarray(a))
                             for n, a in ckpt["model"].items()}}
        if "discriminator" in ckpt:
            payload["discriminator"] = {
                n: torch.as_tensor(np.ascontiguousarray(a))
                for n, a in ckpt["discriminator"].items()}
        if "optimizer" in ckpt:
            payload["optimizer"] = ckpt["optimizer"]
        torch.save(payload, args.to_torch)
        print(f"exported step {args.step} -> {args.to_torch} "
              f"(model{' + optimizer' if 'optimizer' in ckpt else ''})")
        return

    import torch

    from ..compat.torch_fs2 import (convert_torch_fastspeech2,
                                    import_torch_ganlike_optimizer,
                                    import_torch_optimizer,
                                    reference_param_order)

    raw = torch.load(args.torch_ckpt, map_location="cpu", weights_only=True)
    sd = raw.get("model", raw)
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params, batch_stats = convert_torch_fastspeech2(
        sd,
        encoder_layers=cfg.model.transformer.encoder_layer,
        decoder_layers=cfg.model.transformer.decoder_layer,
        multi_speaker=cfg.model.multi_speaker,
    )

    if args.ganlike:
        # reference train_ganlike.py checkpoints: both halves' weights plus
        # the joint ScheduledOptim state (:247-257)
        from ..infer.synthesis import load_model
        from ..models.speaker_encoder import SpeechEmbedder
        from ..train.loop import convert_torch_ge2e

        if "discriminator" not in raw:
            raise SystemExit("--ganlike given but the checkpoint has no "
                             "'discriminator' entry")
        disc_sd = {k: v.numpy() if hasattr(v, "numpy") else v
                   for k, v in raw["discriminator"].items()}
        # the checkpoint defines the discriminator dims (same rule as
        # build_experiment's discriminator_path branch): projection weight
        # is (proj, hidden) in torch layout
        proj_w = disc_sd["projection.linear_layer.weight"]
        n_layers = sum(1 for k in disc_sd
                       if k.startswith("LSTM_stack.weight_hh_l"))
        disc = SpeechEmbedder(n_mels=cfg.preprocess.mel.n_mel_channels,
                              hidden=int(proj_w.shape[1]),
                              proj=int(proj_w.shape[0]),
                              n_layers=n_layers)
        disc_params = convert_torch_ge2e(disc_sd, disc)
        model, variables = load_model(cfg, restore_step=0)
        tx = make_optimizer(cfg.train.optimizer,
                            cfg.model.transformer.encoder_hidden,
                            clip_subtree="model", torch_lstm_bias_compat=True)
        state = create_train_state(model, {
            "params": {"model": params, "discriminator": disc_params},
            "batch_stats": batch_stats,
        }, tx)
        if not args.skip_optimizer and "optimizer" in raw:
            state = state.replace(opt_state=import_torch_ganlike_optimizer(
                state.opt_state, raw["optimizer"], cfg, disc))
        state = state.replace(params=jax.tree.map(jnp.asarray, state.params))
        mgr = CheckpointManager(args.out or cfg.train.path.ckpt_path)
        mgr.save(args.step, state)
        print(f"converted ganlike {args.torch_ckpt} -> {mgr.ckpt_dir} "
              f"@ step {args.step}")
        return

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
    with_opt = False
    if not args.skip_optimizer and isinstance(raw, dict) and "optimizer" in raw:
        names = reference_param_order(
            cfg.model.transformer.encoder_layer,
            cfg.model.transformer.decoder_layer,
            multi_speaker=cfg.model.multi_speaker,
            use_jdit=cfg.model.jdit.use_jdit)
        state = state.replace(opt_state=import_torch_optimizer(
            state.opt_state, raw["optimizer"], param_names=names))
        with_opt = True

    mgr = CheckpointManager(args.out or cfg.train.path.ckpt_path)
    mgr.save(args.step, state)
    print(f"converted {args.torch_ckpt} -> {mgr.ckpt_dir} @ step {args.step}"
          f"{' (with Adam moments)' if with_opt else ''}")


if __name__ == "__main__":
    main()
