"""MCD quality gate (VERDICT r1 item 6, speech-scale in r3): train the
speech-like synthetic corpus to convergence and assert teacher-forced
mel-cepstral distortion under committed, chip-calibrated thresholds — the
north-star fidelity metric (BASELINE.md) produced by the framework itself.

The corpus is the "vocal" style (glottal-pulse source + formant filters +
aspiration + F0 declination/vibrato, data/synthetic.py), whose smooth
spectral envelopes put MCD on the interpretable natural-speech dB scale —
unlike the line-spectral tone corpus the r2 gate used (thresholds at
14-45 dB there were corpus artifacts, not fidelity).

Thresholds from scripts/calibrate_mcd.py --style vocal on the real TPU v5e
(2026-08-19, 4 speakers x 25 utts, batch 8):

    untrained baseline: train 82.3 dB, val 83.0 dB
    step 1500: train mean 29.8 (max 44.0) | val mean 48.0 (max 78.9)
    step 3000: train mean 20.5 (max 35.8) | val mean 53.1 (max 90.9)
    step 4500: train mean 14.7 (max 21.9) | val mean 55.4
    step 9000: train mean 10.3 (max 14.3) | val mean 52.2  <- fit floor

Train-item MCD measures fit fidelity and floors at ~10.3 dB — within ~2x
natural-speech teacher-forced MCD lore (~5-8 dB), the honest scale for a
tiny-model/tiny-corpus gate. Val-item MCD sits at the generalization floor
of a 100-utterance corpus with RANDOM per-phone pitch accents (~52 dB,
unpredictable from text by construction) and gates regressions, not quality.

Slow-gated: ~3000 tiny-model steps on CPU. Run with MASG_SLOW_TESTS=1.
"""

import os

import numpy as np
import pytest

SLOW = os.environ.get("MASG_SLOW_TESTS") == "1"


def teacher_forced_mcd(trainer, dataset):
    from masg_tpu.data.loader import GroupedLoader
    from masg_tpu.utils.mcd import mcd

    bs = getattr(dataset, "batch_size", 4)
    loader = GroupedLoader(dataset, batch_size=bs, group_size=1,
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
    assert scores, "no items scored"
    return float(np.mean(scores))


@pytest.mark.slow
@pytest.mark.skipif(not SLOW, reason="trains to convergence (~4-8 min CPU); "
                                     "set MASG_SLOW_TESTS=1")
def test_vocal_convergence_mcd_gate(tmp_path):
    from masg_tpu.core.config import load_config_dir
    from masg_tpu.data.synthetic import build_synthetic_experiment_dir
    from masg_tpu.train.loop import build_experiment

    cfg_dir = build_synthetic_experiment_dir(
        str(tmp_path), n_speakers=4, utts_per_speaker=25, batch_size=8,
        group_size=1, style="vocal", total_step=3000, log_step=500,
        val_step=10**9, synth_step=10**9, save_step=10**9, warm_up_step=100)
    cfg = load_config_dir(cfg_dir)
    trainer = build_experiment(cfg, n_devices=1)

    untrained = teacher_forced_mcd(trainer, trainer.train_loader.dataset)
    assert untrained > 60.0, untrained  # the gate must have headroom

    trainer.fit(max_steps=3000, verbose=True)

    train_mcd = teacher_forced_mcd(trainer, trainer.train_loader.dataset)
    val_mcd = teacher_forced_mcd(trainer, trainer.val_dataset)
    print(f"MCD gate: untrained {untrained:.1f} dB -> train {train_mcd:.2f}, "
          f"val {val_mcd:.2f}")

    # chip calibration at step 3000: train 20.5, val 53.1; margins cover
    # CPU-vs-TPU numerics and corpus-seed variation
    assert train_mcd < 27.0, train_mcd
    assert val_mcd < 70.0, val_mcd
    # and the gate is meaningful: at least ~3x below the untrained baseline
    assert train_mcd < untrained / 3.0, (train_mcd, untrained)
