"""Calibrate the MCD quality gate (tests/test_mcd_gate.py) on the real chip.

Trains the synthetic corpus through the production Trainer and prints
teacher-forced MCD on TRAIN items (fit fidelity) and VAL items
(generalization) at intervals, plus the untrained baseline, so the committed
gate threshold and the step budget are data, not guesses.

Note the synthetic corpus is nearly line-spectral (pure harmonic tones
against the log(1e-5) floor), which makes absolute MCD values much larger
than on natural speech — a one-mel-bin harmonic misplacement costs several
dB. The gate therefore anchors on the measured curve, not on speech-world
MCD lore. Run on TPU (fast) or CPU (slow):

    python scripts/calibrate_mcd.py [--steps 4000] [--every 500]
"""
import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def teacher_forced_mcd(trainer, dataset):
    """Mean/max MCD of teacher-forced predictions vs GT mels over a dataset."""
    from masg_tpu.data.loader import GroupedLoader
    from masg_tpu.utils.mcd import mcd

    bs = getattr(dataset, "batch_size", 4)
    loader = GroupedLoader(dataset, batch_size=bs, group_size=1, shuffle=False)
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
    ap.add_argument("--n_speakers", type=int, default=2)
    ap.add_argument("--utts", type=int, default=10)
    ap.add_argument("--style", type=str, default="tone",
                    choices=["tone", "vocal"],
                    help="vocal = glottal-pulse formant speech: MCD lands on "
                         "the interpretable natural-speech dB scale")
    args = ap.parse_args()

    from masg_tpu.core.config import load_config_dir
    from masg_tpu.data.synthetic import build_synthetic_experiment_dir
    from masg_tpu.train.loop import build_experiment

    tmp = tempfile.mkdtemp()
    cfg_dir = build_synthetic_experiment_dir(
        tmp, n_speakers=args.n_speakers, utts_per_speaker=args.utts,
        style=args.style,
        batch_size=8, group_size=1, total_step=args.steps,
        log_step=args.every, val_step=10**9,
        synth_step=10**9, save_step=10**9, warm_up_step=100)
    cfg = load_config_dir(cfg_dir)
    trainer = build_experiment(cfg, n_devices=1)

    train_ds = trainer.train_loader.dataset
    m0t, _, _ = teacher_forced_mcd(trainer, train_ds)
    m0v, _, _ = teacher_forced_mcd(trainer, trainer.val_dataset)
    print(f"[calibrate] untrained baseline: train MCD {m0t:.3f} dB, "
          f"val {m0v:.3f} dB", flush=True)

    done = 0
    for upto in range(args.every, args.steps + 1, args.every):
        # continue from `done` (fit counts from restore_step+1 and positions
        # the loader there; the in-memory state carries the real progress)
        trainer.fit(restore_step=done, max_steps=upto - done, verbose=True)
        done = upto
        mt, wt, nt = teacher_forced_mcd(trainer, train_ds)
        mv, wv, nv = teacher_forced_mcd(trainer, trainer.val_dataset)
        print(f"[calibrate] step {upto}: train MCD mean={mt:.3f} max={wt:.3f} "
              f"({nt}) | val mean={mv:.3f} max={wv:.3f} ({nv})", flush=True)


if __name__ == "__main__":
    sys.exit(main())
