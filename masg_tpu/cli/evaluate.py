"""Standalone evaluation CLI.

Equivalent of running the reference's evaluate.py on a checkpoint: dataset-
size-weighted mean validation losses (reference evaluate.py:18-113).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("--restore_step", type=int, required=True)
    parser.add_argument("--corpus", type=str, nargs="*", default=None)
    parser.add_argument("--split", type=str, default="val.txt",
                        choices=["val.txt", "test.txt"],
                        help="metadata split to evaluate (reference "
                             "evaluate.py:32-33 always uses val.txt)")
    args = parser.parse_args(argv)

    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..core.config import load_config_dir
    from ..train.loop import build_experiment

    cfg = load_config_dir(args.config)
    trainer = build_experiment(cfg, corpora=args.corpus,
                               restore_step=args.restore_step,
                               val_split=args.split)
    means = trainer.evaluate(args.restore_step)
    if means:
        print(
            "Validation Step {}, Total Loss: {:.4f}, Mel Loss: {:.4f}, "
            "Mel PostNet Loss: {:.4f}, Pitch Loss: {:.4f}, Energy Loss: {:.4f}, "
            "Duration Loss: {:.4f}".format(args.restore_step, *means)
        )


if __name__ == "__main__":
    main()
