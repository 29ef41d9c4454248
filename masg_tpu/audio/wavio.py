"""WAV file IO via the stdlib (no soundfile/librosa in this image).

Covers the reference's audio IO surface: librosa.load(sr=22050) for reading
(preprocessor.py:186) and scipy wavfile.write of int16 at max_wav_value scale
for synthesis output (utils/tools.py:274, utils/model.py:84-90).
"""

from __future__ import annotations

import wave
from typing import Tuple

import numpy as np


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a PCM WAV -> (float32 mono in [-1, 1], sample_rate)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(n)
    if sw == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sw == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sw} in {path}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    return data, sr


def write_wav(path: str, audio: np.ndarray, sr: int) -> None:
    """Write float [-1, 1] (or already-int16) audio as 16-bit PCM."""
    audio = np.asarray(audio)
    if audio.dtype != np.int16:
        audio = np.clip(audio, -1.0, 1.0)
        audio = (audio * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(audio.tobytes())


def resample_linear(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Lightweight linear-interp resampler (tests/smoke paths only)."""
    if sr_in == sr_out:
        return audio
    n_out = int(round(len(audio) * sr_out / sr_in))
    x_old = np.arange(len(audio)) / sr_in
    x_new = np.arange(n_out) / sr_out
    return np.interp(x_new, x_old, audio).astype(audio.dtype)


def resample_kaiser(
    audio: np.ndarray, sr_in: int, sr_out: int,
    num_zeros: int = 32, beta: float = 8.6,
) -> np.ndarray:
    """Windowed-sinc (Kaiser) polyphase resampler.

    Replaces librosa's high-quality resample for the offline corpus path
    (e.g. VCTK 48 kHz -> 22.05 kHz; the reference relies on
    librosa.load(sr=22050), preprocessor.py:186). Anti-aliased: the sinc cuts
    off at min(sr_in, sr_out)/2; the polyphase filtering runs through scipy's
    C implementation.
    """
    if sr_in == sr_out:
        return np.asarray(audio, dtype=np.float32)
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(int(sr_in), int(sr_out))
    up, down = sr_out // g, sr_in // g

    # prototype low-pass at the tighter Nyquist on the upsampled grid
    f_c = min(sr_in, sr_out) / 2.0 / (sr_in * up)
    half_len = int(np.ceil(num_zeros / (2.0 * f_c)))
    n = np.arange(-half_len, half_len + 1)
    h = 2 * f_c * np.sinc(2 * f_c * n) * np.kaiser(len(n), beta)
    h = h / h.sum()

    # NOTE: scipy's resample_poly multiplies an array-valued window by `up`
    # itself; passing h*up would double-apply the gain (x147 for 48k->22.05k)
    y = resample_poly(np.asarray(audio, dtype=np.float64), up, down, window=h)
    return y.astype(np.float32)
