"""MCD quality gate (VERDICT r1 item 6): train the synthetic corpus to
convergence, synthesize val items with ground-truth durations, and assert
mel-cepstral distortion vs the GT mels under a committed threshold — the
north-star fidelity metric (BASELINE.md) produced by the framework itself.

Slow-gated: ~1-2k tiny-model steps on CPU. Run with MASG_SLOW_TESTS=1.
"""

import os

import numpy as np
import pytest

SLOW = os.environ.get("MASG_SLOW_TESTS") == "1"


@pytest.mark.slow
@pytest.mark.skipif(not SLOW, reason="trains to convergence (~2-4 min CPU); "
                                     "set MASG_SLOW_TESTS=1")
def test_synthetic_convergence_mcd_gate(tmp_path):
    from masg_tpu.core.config import load_config_dir
    from masg_tpu.data.synthetic import build_synthetic_experiment_dir
    from masg_tpu.train.loop import build_experiment
    from masg_tpu.utils.mcd import mcd

    cfg_dir = build_synthetic_experiment_dir(
        str(tmp_path), n_speakers=2, utts_per_speaker=10, batch_size=8,
        group_size=1, total_step=1500, log_step=500, val_step=10**9,
        synth_step=10**9, save_step=10**9, warm_up_step=100)
    cfg = load_config_dir(cfg_dir)
    trainer = build_experiment(cfg, n_devices=1)
    trainer.fit(max_steps=1500, verbose=True)

    # teacher-forced val forward: GT durations drive the length regulator,
    # MCD compares predicted vs GT mels frame-aligned (no DTW needed)
    from masg_tpu.data.loader import GroupedLoader

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
    assert scores, "no val items scored"
    mean_mcd = float(np.mean(scores))
    print(f"val MCD vs GT mels after 1500 steps: {mean_mcd:.3f} dB "
          f"({len(scores)} items, max {np.max(scores):.3f})")
    # committed gate: calibrated on this corpus/model (see BASELINE.md);
    # an un-trained model scores >> 10 dB, a converged one well under this
    assert mean_mcd < 5.0, mean_mcd
