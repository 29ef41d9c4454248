"""Generate the committed real-speech-like F0 fixture (VERDICT r1 item 4).

pyworld is unavailable in this image (and the reference ships no audio), so
the fixture is a synthesized VOCAL signal whose instantaneous F0 is known
exactly: a glottal-style harmonic source shaped by vowel formant envelopes
(/a/ then /i/), with an F0 glide + 5 Hz vibrato, an unvoiced fricative
segment, and silence padding. This gives the F0 tests something no recorded
utterance can: an absolute ground-truth contour, plus a frozen golden output
to catch regressions in both the numpy and C++ DIO+StoneMask paths.

Writes tests/data/vocal_fixture.wav, *_true_f0.npy (ground truth per frame,
0 where unvoiced), *_golden_f0.npy (extract_f0 numpy-path output at
generation time).

Matches the semantics the reference burns into stats.json via pyworld
(preprocessor/preprocessor.py:196-205).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 22050
HOP = 256
FRAME_PERIOD = HOP / SR * 1000.0

# (start_s, end_s, kind, f0_start, f0_end, formants[(freq, bw_gain_width)])
A_FORMANTS = [(800, 1.0), (1200, 0.5), (2500, 0.25)]
I_FORMANTS = [(300, 1.0), (2300, 0.5), (3000, 0.3)]
SEGMENTS = [
    (0.00, 0.30, "sil", 0, 0, None),
    (0.30, 1.20, "vowel", 110.0, 150.0, A_FORMANTS),
    (1.20, 1.50, "fric", 0, 0, None),
    (1.50, 2.50, "vowel", 160.0, 120.0, I_FORMANTS),
    (2.50, 2.80, "sil", 0, 0, None),
]
VIBRATO_HZ = 5.0
VIBRATO_DEPTH = 0.02  # +-2%


def formant_gain(freq_hz, formants):
    """Sum of Gaussian resonance bumps + spectral tilt."""
    g = 0.05
    for fc, amp in formants:
        g = g + amp * np.exp(-0.5 * ((freq_hz - fc) / (0.12 * fc + 60.0)) ** 2)
    return g * (1.0 / (1.0 + freq_hz / 3000.0))


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(7)
    total_s = SEGMENTS[-1][1]
    n = int(total_s * SR)
    t = np.arange(n) / SR
    x = np.zeros(n)
    f0_inst = np.zeros(n)  # instantaneous true F0 per sample

    for (s0, s1, kind, fa, fb, formants) in SEGMENTS:
        i0, i1 = int(s0 * SR), int(s1 * SR)
        seg_t = t[i0:i1] - s0
        dur = s1 - s0
        if kind == "sil":
            continue
        if kind == "fric":
            x[i0:i1] = 0.03 * rng.normal(size=i1 - i0)
            continue
        # voiced vowel: linear F0 glide + vibrato
        f0 = (fa + (fb - fa) * seg_t / dur) * (
            1.0 + VIBRATO_DEPTH * np.sin(2 * np.pi * VIBRATO_HZ * seg_t)
        )
        f0_inst[i0:i1] = f0
        phase0 = 2 * np.pi * np.cumsum(f0) / SR
        f0_mean = 0.5 * (fa + fb)
        seg = np.zeros(i1 - i0)
        h = 1
        while h * f0_mean < 4500.0:
            amp = formant_gain(h * f0_mean, formants) / np.sqrt(h)
            seg += amp * np.sin(h * phase0 + 0.07 * h * h)
            h += 1
        seg += 0.004 * rng.normal(size=i1 - i0)  # breath noise
        # fade edges
        fade = int(0.01 * SR)
        seg[:fade] *= np.linspace(0, 1, fade)
        seg[-fade:] *= np.linspace(1, 0, fade)
        x[i0:i1] = 0.35 * seg / np.max(np.abs(seg))

    # per-frame true F0 at the pyworld frame convention
    n_frames = int(n / SR * 1000.0 / FRAME_PERIOD) + 1
    frame_t = np.arange(n_frames) * FRAME_PERIOD / 1000.0
    idx = np.minimum((frame_t * SR).astype(int), n - 1)
    true_f0 = f0_inst[idx]

    from masg_tpu.audio.f0 import extract_f0
    from masg_tpu.audio.wavio import write_wav

    golden = extract_f0(x, SR, FRAME_PERIOD, use_native=False)

    write_wav(os.path.join(out_dir, "vocal_fixture.wav"), x.astype(np.float32), SR)
    np.save(os.path.join(out_dir, "vocal_fixture_true_f0.npy"), true_f0)
    np.save(os.path.join(out_dir, "vocal_fixture_golden_f0.npy"), golden)

    voiced = (true_f0 > 0) & (golden > 0)
    err = np.abs(golden[voiced] - true_f0[voiced]) / true_f0[voiced]
    print(f"frames={n_frames} voiced_true={int((true_f0 > 0).sum())} "
          f"voiced_detected={int((golden > 0).sum())} "
          f"median_rel_err={np.median(err):.4f} p90={np.quantile(err, 0.9):.4f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "data"))
