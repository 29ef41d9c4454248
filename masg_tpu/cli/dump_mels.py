"""Dump teacher-forced predicted mels from a trained checkpoint.

The upstream HiFi-GAN fine-tuning workflow pairs acoustic-model-predicted
mels with ground-truth audio; the reference repo has no tool to produce
them (its users lean on the Tacotron2 GTA scripts). This CLI closes the
loop for the full pipeline:

    python -m masg_tpu.cli.dump_mels -c config/JSUT --restore_step 300000 \\
        --out out/predicted_mel [--split train.txt val.txt] [--corpus JSUT]

then:

    python -m masg_tpu.cli.train_vocoder --wav_dir raw_data/JSUT \\
        --mel_dir out/predicted_mel --warm_start_generator g_universal ...

Forward is teacher-forced (ground-truth durations/pitch/energy), so every
predicted mel is frame-aligned with its ground-truth audio: frame i covers
samples [i*hop, (i+1)*hop). Files are named `{speaker}-mel-{basename}.npy`,
the same convention as the preprocessed ground-truth mels — `--mel_dir` can
therefore also point straight at a preprocessed `mel/` directory to train
on ground-truth features.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("--restore_step", type=int, required=True)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--corpus", type=str, nargs="*", default=None)
    parser.add_argument("--split", type=str, nargs="*",
                        default=["train.txt", "val.txt"])
    parser.add_argument("--ganlike", action="store_true",
                        help="checkpoint came from train_ganlike")
    parser.add_argument("--batch_size", type=int, default=None)
    args = parser.parse_args(argv)

    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import numpy as np

    from ..core.config import load_config_dir
    from ..train.loop import build_corpus_dict, build_experiment
    from ..train.step import _forward

    cfg = load_config_dir(args.config)
    trainer = build_experiment(cfg, corpora=args.corpus,
                               ganlike=args.ganlike,
                               restore_step=args.restore_step)
    model = trainer.model
    params = jax.device_get(trainer.state.params)
    if args.ganlike:
        params = params["model"]
    batch_stats = jax.device_get(trainer.state.batch_stats)
    bs = args.batch_size or cfg.train.optimizer.batch_size

    @jax.jit
    def fwd(batch):
        out, _ = _forward(model, params, batch_stats, batch, rng=None,
                          train=False)
        return out.postnet_mel, out.mel_len

    os.makedirs(args.out, exist_ok=True)
    n_written = 0
    # reuse the trainer's val-set construction path for arbitrary splits by
    # instantiating fresh Datasets per (corpus, split)
    from ..data.dataset import Dataset

    corpora = args.corpus or list(cfg.corpora)
    for split in args.split:
        for corpus in corpora:
            ds = Dataset(split, build_corpus_dict(cfg, corpus),
                         batch_size=bs, sort=False, drop_last=False,
                         text_bucket=16, mel_bucket=64)
            # length-sorted chunks bound pad waste and bucket compiles
            order = np.argsort([-len(t.split()) for t in ds.text])
            for i in range(0, len(order), bs):
                idxs = order[i:i + bs]
                data = [ds[int(j)] for j in idxs]
                batch = ds.reprocess(data, list(range(len(data))))
                feats = {k: v for k, v in batch.items()
                         if k not in ("ids", "raw_texts")}
                mels, mel_lens = jax.device_get(fwd(feats))
                for j, d in enumerate(data):
                    name = f"{d['speaker_name']}-mel-{d['id']}.npy"
                    np.save(os.path.join(args.out, name),
                            np.asarray(mels[j, : int(mel_lens[j])], np.float32))
                    n_written += 1
            print(f"{corpus}/{split}: done ({n_written} total)")
    print(f"wrote {n_written} predicted mels to {args.out}")


if __name__ == "__main__":
    main()
