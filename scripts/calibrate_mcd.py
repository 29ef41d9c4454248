"""Calibrate the MCD quality gate (tests/test_mcd_gate.py) on the real chip.

Trains the synthetic corpus through the production Trainer and prints
teacher-forced val MCD at intervals, so the committed gate threshold and the
step budget are data, not guesses. Run on TPU (fast) or CPU (slow):

    python scripts/calibrate_mcd.py [--steps 4000] [--every 500]
"""
import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def val_mcd(trainer):
    from masg_tpu.data.loader import GroupedLoader
    from masg_tpu.utils.mcd import mcd

    loader = GroupedLoader(trainer.val_dataset, batch_size=4, group_size=1,
                           shuffle=False)
    scores = []
    for group in loader:
        for batch in group:
            _, _, out = trainer.eval_step_fn(
                trainer.state, trainer._place_batch(batch))
            pred = np.asarray(out.postnet_mel)
            gt = np.asarray(batch["mels"])
            for i in range(pred.shape[0]):
                n = int(np.asarray(out.mel_len)[i])
                if n > 8:
                    scores.append(mcd(pred[i, :n], gt[i, :n]))
    return float(np.mean(scores)), float(np.max(scores)), len(scores)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--every", type=int, default=500)
    args = ap.parse_args()

    from masg_tpu.core.config import load_config_dir
    from masg_tpu.data.synthetic import build_synthetic_experiment_dir
    from masg_tpu.train.loop import build_experiment

    tmp = tempfile.mkdtemp()
    cfg_dir = build_synthetic_experiment_dir(
        tmp, n_speakers=2, utts_per_speaker=10, batch_size=8, group_size=1,
        total_step=args.steps, log_step=args.every, val_step=10**9,
        synth_step=10**9, save_step=10**9, warm_up_step=100)
    cfg = load_config_dir(cfg_dir)
    trainer = build_experiment(cfg, n_devices=1)

    for upto in range(args.every, args.steps + 1, args.every):
        trainer.fit(max_steps=upto, verbose=True)
        mean, worst, n = val_mcd(trainer)
        print(f"[calibrate] step {upto}: val MCD mean={mean:.3f} dB "
              f"max={worst:.3f} ({n} items)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
