"""HiFi-GAN vocoder training CLI.

The reference only LOADS pretrained vocoder checkpoints (utils/model.py:42-71)
and ships the hyperparameters in hifigan/config.json; training one for a new
corpus required the upstream jik876/hifi-gan repo. This CLI closes that gap
with the same config.json schema:

    python -m masg_tpu.cli.train_vocoder --wav_dir raw_data/JSUT \\
        --out out/vocoder [--config hifigan/config.json] [--steps 100000]

Checkpoints: `vocoder_{step}.msgpack` (full GAN train state, resumable via
--restore) and `generator_{step}.msgpack` (folded generator params — pass as
`--vocoder_checkpoint` to the synthesize/serve CLIs / get_vocoder).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def save_msgpack(path: str, tree) -> None:
    import flax

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(tree))
    os.replace(tmp, path)


def load_msgpack(path: str, template):
    import flax

    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--wav_dir", type=str, required=True,
                        help="directory tree of training wavs")
    parser.add_argument("--mel_dir", type=str, default=None,
                        help="fine-tuning mode (upstream --fine_tuning): "
                             "generator inputs come from .npy mels here — "
                             "e.g. cli/dump_mels output — paired with "
                             "wav_dir audio by basename")
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--config", type=str, default=None,
                        help="hifigan config.json (reference schema); "
                             "defaults to the universal V1 hyperparameters")
    parser.add_argument("--steps", type=int, default=100000)
    parser.add_argument("--batch_size", type=int, default=None,
                        help="override config batch_size")
    parser.add_argument("--restore", type=str, default=None,
                        help="vocoder_{step}.msgpack to resume from")
    parser.add_argument("--warm_start_generator", type=str, default=None,
                        help="torch or msgpack generator checkpoint to "
                             "initialize G from (fine-tune mode)")
    parser.add_argument("--save_step", type=int, default=5000)
    parser.add_argument("--log_step", type=int, default=100)
    parser.add_argument("--no_normalize", action="store_true",
                        help="train on raw wav amplitudes instead of the "
                             "upstream per-file 0.95-peak normalization "
                             "(from-scratch mode only; fine-tuning never "
                             "normalizes, matching upstream)")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--n_devices", type=int, default=None,
                        help="cap the data-parallel device count (default: "
                             "all visible devices)")
    args = parser.parse_args(argv)

    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import numpy as np

    from ..data.vocoder import (VocoderFineTuneDataset, VocoderSegmentDataset,
                                list_wavs)
    from ..infer.vocoder import DEFAULT_HIFIGAN_CONFIG
    from ..models.hifigan import HiFiGANGenerator
    from ..models.hifigan_disc import build_discriminators
    from ..train.vocoder import (export_generator_params,
                                 init_vocoder_train_state,
                                 make_vocoder_train_step)

    cfg = dict(DEFAULT_HIFIGAN_CONFIG)
    cfg.update({"segment_size": 8192, "learning_rate": 2e-4, "adam_b1": 0.8,
                "adam_b2": 0.99, "lr_decay": 0.999, "batch_size": 16,
                "seed": 1234})
    default_cfg = os.path.join(os.path.dirname(__file__), "..", "..",
                               "hifigan", "config.json")
    cfg_path = args.config or (default_cfg if os.path.exists(default_cfg) else None)
    if cfg_path:
        with open(cfg_path) as f:
            cfg.update(json.load(f))
    batch_size = args.batch_size or int(cfg["batch_size"])
    seed = args.seed if args.seed is not None else int(cfg.get("seed", 1234))

    if args.mel_dir:
        dataset = VocoderFineTuneDataset(
            args.mel_dir, args.wav_dir, segment_size=int(cfg["segment_size"]),
            hop_size=int(cfg["hop_size"]),
            sample_rate=int(cfg["sampling_rate"]), seed=seed)
        print(f"{len(dataset.pairs)} (mel, wav) fine-tuning pairs")
    else:
        paths = list_wavs(args.wav_dir)
        print(f"{len(paths)} training wavs under {args.wav_dir}")
        dataset = VocoderSegmentDataset(
            paths, segment_size=int(cfg["segment_size"]),
            sample_rate=int(cfg["sampling_rate"]), seed=seed,
            normalize=not args.no_normalize)
    steps_per_epoch = dataset.steps_per_epoch(batch_size)

    gen = HiFiGANGenerator(
        n_mels=cfg.get("num_mels", 80),
        upsample_rates=tuple(cfg["upsample_rates"]),
        upsample_kernel_sizes=tuple(cfg["upsample_kernel_sizes"]),
        upsample_initial_channel=cfg["upsample_initial_channel"],
        resblock_kernel_sizes=tuple(cfg["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in cfg["resblock_dilation_sizes"]),
    )
    mpd, msd = build_discriminators(cfg)

    gen_params = None
    if args.warm_start_generator:
        from ..infer.vocoder import load_generator_checkpoint

        gen_params = load_generator_checkpoint(args.warm_start_generator, gen, cfg)
    state, (gen_tx, disc_tx) = init_vocoder_train_state(
        gen, mpd, msd, cfg, steps_per_epoch, jax.random.PRNGKey(seed),
        gen_params=gen_params)
    if args.restore:
        state = load_msgpack(args.restore, state)
        print(f"restored {args.restore} at step {int(state.step)}")

    # data parallelism over the mesh: params/opt replicated, batches sharded
    # on the 'data' axis — XLA inserts the gradient all-reduce
    from ..parallel.mesh import (data_parallel_size, make_mesh, replicate,
                                 shard_batch)

    mesh = None
    n_avail = args.n_devices or len(jax.devices())
    n_data = data_parallel_size(batch_size, n_avail)
    if n_data > 1:
        mesh = make_mesh(n_data=n_data, n_model=1)
        state = replicate(state, mesh)
        print(f"data-parallel GAN training over {n_data} devices")

    step_fn = jax.jit(make_vocoder_train_step(gen, mpd, msd, gen_tx, disc_tx,
                                              cfg, from_mels=bool(args.mel_dir)))

    os.makedirs(args.out, exist_ok=True)
    start = int(state.step)
    t0 = time.time()
    log_path = os.path.join(args.out, "log.jsonl")
    for audio in dataset.batches(batch_size, num_steps=args.steps - start):
        if mesh is not None:
            audio = shard_batch(audio, mesh)
        state, metrics = step_fn(state, audio)
        step = int(state.step)
        if step % args.log_step == 0 or step == start + 1:
            m = jax.device_get(metrics)
            rate = (step - start) / max(1e-9, time.time() - t0)
            line = {"step": step, "disc_loss": float(m.disc_loss),
                    "gen_loss": float(m.gen_loss), "mel_l1": float(m.mel_l1),
                    "fm": float(m.fm), "steps_per_s": round(rate, 3)}
            print(json.dumps(line), flush=True)
            with open(log_path, "a") as f:
                f.write(json.dumps(line) + "\n")
        if step % args.save_step == 0 or step >= args.steps:
            save_msgpack(os.path.join(args.out, f"vocoder_{step}.msgpack"),
                         jax.device_get(state))
            save_msgpack(os.path.join(args.out, f"generator_{step}.msgpack"),
                         export_generator_params(state))
    print(f"done at step {int(state.step)}; checkpoints in {args.out}")


if __name__ == "__main__":
    main()
