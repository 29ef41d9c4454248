"""GE2E speaker-encoder training CLI.

Equivalent of the reference submodule's `python train_speech_embedder.py`
(Multilingual-.../train_speech_embedder.py:115-248) but configured via flags
instead of the submodule's hardcoded-path Dotdict YAML (hparam.py:50 — a
hazard the rebuild deliberately does not reproduce).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=str, required=True,
                        help="dir of {dataset}_{spkr}_{gender}_{lang}.npy chunks")
    parser.add_argument("--datasets", type=str, nargs="+", default=["JVS", "VCTK"])
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("-N", "--n_speakers", type=int, default=32)
    parser.add_argument("-M", "--m_utts", type=int, default=10)
    parser.add_argument("--epochs", type=int, default=2400)
    parser.add_argument("--batches_per_epoch", type=int, default=None)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--da_startpoint", type=float, default=0.0)
    parser.add_argument("--wo_ge2e", action="store_true",
                        help="reproduce the reference snapshot's woGE2E ablation")
    parser.add_argument("--checkpoint_interval", type=int, default=200)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--n_devices", type=int, default=None,
                        help="cap the data-parallel device mesh (default all; "
                             "replaces the reference's NCCL DDP, "
                             "train_speech_embedder.py:128-132)")
    args = parser.parse_args(argv)

    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..train.ge2e import train_speaker_encoder

    train_speaker_encoder(
        data_path=args.data_path,
        datasets=args.datasets,
        out_dir=args.out_dir,
        n_speakers=args.n_speakers,
        m_utts=args.m_utts,
        epochs=args.epochs,
        batches_per_epoch=args.batches_per_epoch,
        lr=args.lr,
        da_startpoint=args.da_startpoint,
        use_ge2e_backward=not args.wo_ge2e,
        checkpoint_interval=args.checkpoint_interval,
        seed=args.seed,
        n_devices=args.n_devices,
    )


if __name__ == "__main__":
    main()
