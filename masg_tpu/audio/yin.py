"""YIN F0 estimation (de Cheveigné & Kawahara 2002).

A second, INDEPENDENT first-party F0 estimator from a different algorithm
family than audio/f0.py's DIO+StoneMask (zero-crossing band candidates +
instantaneous-frequency refinement): YIN works on the cumulative-mean-
normalized difference function of each frame. Its purpose here is to bound
the DIO implementation's deviation in an environment where pyworld cannot be
installed (VERDICT r5 item 6): systematic disagreement between two unrelated
algorithms flags bugs that shared-fixture tests cannot.

Steps (paper section numbers):
  (2) difference function d_t(tau) = sum_j (x[j] - x[j+tau])^2, computed
      O(W log W) via FFT autocorrelation,
  (3) cumulative mean normalized difference
      d'(tau) = d(tau) * tau / sum_{1..tau} d(j),
  (4) absolute threshold: smallest tau with d'(tau) < threshold (first
      local minimum below it), else global minimum,
  (5) parabolic interpolation of the minimum,
  (6) voicing: frames whose best d' exceeds the threshold are unvoiced.
"""

from __future__ import annotations

import numpy as np

DEFAULT_F0_FLOOR = 71.0
DEFAULT_F0_CEIL = 800.0


def _difference_function(frame: np.ndarray, tau_max: int, w: int) -> np.ndarray:
    """d(tau) for tau in [0, tau_max) with integration window w.

    d(tau) = r(0) + r_tau(0) - 2*corr(tau), where corr is the linear
    autocorrelation sum_{j<w} x[j] x[j+tau], via FFT.
    """
    n = len(frame)
    assert n >= w + tau_max, (n, w, tau_max)
    x = frame.astype(np.float64)
    nfft = 1 << int(np.ceil(np.log2(2 * n)))
    fx = np.fft.rfft(x, nfft)
    # cross-correlation of x with itself: corr[tau] = sum_j x[j] x[j+tau]
    # restricted to j < w
    fw = np.fft.rfft(x[:w][::-1], nfft)
    corr_full = np.fft.irfft(fx * fw, nfft)
    corr = corr_full[w - 1 : w - 1 + tau_max]

    sq = x * x
    csum = np.concatenate([[0.0], np.cumsum(sq)])
    # r(0) energy of x[0:w] (constant) and r_tau(0) energy of x[tau:tau+w]
    e0 = csum[w] - csum[0]
    e_tau = csum[np.arange(tau_max) + w] - csum[np.arange(tau_max)]
    return e0 + e_tau - 2.0 * corr


def _cmnd(d: np.ndarray) -> np.ndarray:
    """Cumulative-mean-normalized difference (paper step 3)."""
    out = np.ones_like(d)
    cums = np.cumsum(d[1:])
    tau = np.arange(1, len(d))
    with np.errstate(divide="ignore", invalid="ignore"):
        out[1:] = np.where(cums > 0, d[1:] * tau / cums, 1.0)
    return out


def yin_frame(
    frame: np.ndarray,
    fs: int,
    f0_floor: float = DEFAULT_F0_FLOOR,
    f0_ceil: float = DEFAULT_F0_CEIL,
    threshold: float = 0.15,
) -> float:
    """F0 of one frame, 0.0 if unvoiced."""
    tau_min = max(2, int(fs / f0_ceil))
    tau_max = int(np.ceil(fs / f0_floor)) + 2
    w = tau_max  # integration window of one max period
    if len(frame) < w + tau_max:
        return 0.0
    d = _difference_function(frame, tau_max, w)
    nd = _cmnd(d)

    tau = -1
    for i in range(tau_min, tau_max - 1):
        if nd[i] < threshold:
            while i + 1 < tau_max - 1 and nd[i + 1] < nd[i]:
                i += 1
            tau = i
            break
    if tau < 0:
        i = int(np.argmin(nd[tau_min : tau_max - 1])) + tau_min
        if nd[i] >= 0.6:  # no dip at all: unvoiced
            return 0.0
        tau = i
    if nd[tau] >= threshold and nd[tau] >= 0.6:
        return 0.0

    # parabolic interpolation around the minimum (step 5)
    if 1 <= tau < len(d) - 1:
        a, b, c = d[tau - 1], d[tau], d[tau + 1]
        denom = a - 2 * b + c
        shift = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
        shift = float(np.clip(shift, -1.0, 1.0))
    else:
        shift = 0.0
    return float(fs / (tau + shift))


def yin(
    x: np.ndarray,
    fs: int,
    frame_period: float = 256 / 22050 * 1000,
    f0_floor: float = DEFAULT_F0_FLOOR,
    f0_ceil: float = DEFAULT_F0_CEIL,
    threshold: float = 0.15,
) -> np.ndarray:
    """Frame-wise YIN F0 on the same frame grid as audio/f0.py's dio():
    frame centers at i * frame_period ms; returns 0.0 on unvoiced frames."""
    x = np.asarray(x, np.float64)
    hop = frame_period / 1000.0 * fs
    tau_max = int(np.ceil(fs / f0_floor)) + 2
    half = tau_max  # analysis span: +-tau_max around the frame center
    n_frames = int(len(x) / hop) + 1
    out = np.zeros(n_frames)
    for i in range(n_frames):
        center = int(round(i * hop))
        lo = max(0, center - half)
        seg = x[lo : center + half]
        out[i] = yin_frame(seg, fs, f0_floor, f0_ceil, threshold)
    return out


def compare_f0(
    f0_a: np.ndarray, f0_b: np.ndarray
) -> dict:
    """Agreement metrics between two frame-aligned F0 tracks: voicing
    agreement fraction and median/p90 absolute error in cents on co-voiced
    frames."""
    n = min(len(f0_a), len(f0_b))
    a, b = np.asarray(f0_a[:n]), np.asarray(f0_b[:n])
    va, vb = a > 0, b > 0
    voicing_agree = float(np.mean(va == vb)) if n else 0.0
    both = va & vb
    if both.sum() == 0:
        return {"n_frames": n, "voicing_agreement": voicing_agree,
                "n_covoiced": 0, "median_cents": None, "p90_cents": None}
    cents = 1200.0 * np.abs(np.log2(a[both] / b[both]))
    return {
        "n_frames": int(n),
        "voicing_agreement": voicing_agree,
        "n_covoiced": int(both.sum()),
        "median_cents": float(np.median(cents)),
        "p90_cents": float(np.percentile(cents, 90)),
        "gross_error_rate_50c": float(np.mean(cents > 50.0)),
    }
