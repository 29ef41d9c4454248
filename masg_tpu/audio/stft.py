"""jit-compiled batched STFT / mel feature pipeline.

Numerically matches the reference's torchaudio stack
(preprocessor/preprocessor.py:44-59,330-336):
  Spectrogram(n_fft=1024, win=1024, hop=256, power=1, center=True,
              pad_mode='reflect', hann periodic window)
  -> MelScale(80 mels, 22050 Hz, fmin 0, fmax 8000, slaney norm & scale)
  -> log(clamp_min(mel, 1e-5)); energy = ||magnitude||_2 per frame.

Everything is pure jnp with static shapes, so whole batches of utterances are
featurized in one XLA program on device (the reference loops per utterance on
host CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann (torch.hann_window default)."""
    n = np.arange(win_length)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_mels: int = 80,
    n_fft: int = 1024,
    sample_rate: int = 22050,
    f_min: float = 0.0,
    f_max: float = 8000.0,
) -> np.ndarray:
    """(n_fft//2+1, n_mels) slaney-scale, slaney-normalized triangular filters.

    Matches torchaudio MelScale(norm='slaney', mel_scale='slaney') /
    librosa.filters.mel(htk=False, norm='slaney').
    """

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = 3.0 * f / 200.0
        min_log_hz = 1000.0
        min_log_mel = min_log_hz * 3.0 / 200.0
        logstep = np.log(6.4) / 27.0
        with np.errstate(divide="ignore"):
            log_branch = min_log_mel + np.log(
                np.where(f > 0, f, 1.0) / min_log_hz
            ) / logstep
        return np.where(f >= min_log_hz, log_branch, mel)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = 200.0 * m / 3.0
        min_log_hz = 1000.0
        min_log_mel = min_log_hz * 3.0 / 200.0
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)

    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)

    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    # slaney norm: scale each filter by 2 / bandwidth
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def stft_magnitude(
    audio: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    center: bool = True,
    pad_to: int | None = None,
) -> jnp.ndarray:
    """|STFT| of (..., T) audio -> (..., n_freqs, n_frames), power=1.

    center=True reflect-pads n_fft//2 on both sides (torch.stft semantics).

    pad_to: zero-pad the (already reflect-padded) signal out to this many
    samples so callers can bucket input lengths into a few compiled shapes.
    Because the reflect padding is applied to the true signal FIRST, every
    frame whose window lies within the reflect-padded extent is bit-identical
    to the unbucketed result — only the extra tail frames (which the caller
    discards) read zeros.
    """
    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (audio.ndim - 1) + [(pad, pad)]
        audio = jnp.pad(audio, pad_widths, mode="reflect")
    if pad_to is not None:
        target = pad_to + (n_fft if center else 0)
        if target < audio.shape[-1]:
            raise ValueError(
                f"pad_to {pad_to} < audio length {audio.shape[-1]}")
        tail = [(0, 0)] * (audio.ndim - 1) + [(0, target - audio.shape[-1])]
        audio = jnp.pad(audio, tail)

    t = audio.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]  # (n_frames, n_fft)
    frames = audio[..., idx] * window  # (..., n_frames, n_fft)
    spec = jnp.fft.rfft(frames, axis=-1)  # (..., n_frames, n_freqs)
    return jnp.abs(spec).swapaxes(-1, -2)  # (..., n_freqs, n_frames)


def mel_spectrogram_and_energy(
    audio: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_mels: int = 80,
    sample_rate: int = 22050,
    f_min: float = 0.0,
    f_max: float = 8000.0,
    pad_to: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., T) audio -> (log-mel (..., n_mels, frames), energy (..., frames)).

    Reference calc_spectrogram (preprocessor.py:330-336): clip audio to [-1,1],
    magnitude STFT, slaney mel, log(clamp_min(1e-5)); energy = L2 over freqs.

    pad_to: length-bucketing passthrough (see stft_magnitude) — frames beyond
    the true signal's frame count must be discarded by the caller.
    """
    audio = jnp.clip(audio, -1.0, 1.0)
    mag = stft_magnitude(audio, n_fft, hop_length, win_length, pad_to=pad_to)
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate, f_min, f_max))
    mel = jnp.einsum("...ft,fm->...mt", mag, fb)
    logmel = jnp.log(jnp.clip(mel, 1e-5, None))
    energy = jnp.sqrt(jnp.sum(mag * mag, axis=-2))
    return logmel, energy
