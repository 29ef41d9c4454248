"""Golden tests: JAX STFT/mel pipeline vs torch.stft (the C++ kernel under
the reference's torchaudio stack; torchaudio itself is not in this image)."""

import numpy as np
import pytest

from masg_tpu.audio.stft import hann_window, mel_filterbank, mel_spectrogram_and_energy, stft_magnitude


def make_audio(seconds=1.2, sr=22050, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    sig = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 440 * t + 0.3)
        + 0.05 * rng.normal(size=t.shape)
    )
    return sig.astype(np.float32)


def torch_magspec(audio):
    """torchaudio.transforms.Spectrogram(power=1, center=True) equivalent via
    torch.stft — identical parameters (hann periodic window, reflect pad)."""
    import torch

    s = torch.stft(
        torch.from_numpy(audio), n_fft=1024, hop_length=256, win_length=1024,
        window=torch.hann_window(1024), center=True, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    return torch.abs(s)


def test_hann_window_matches_torch():
    import torch

    # torch computes the cos in float32; our float64->float32 differs by <4 ulp
    np.testing.assert_allclose(hann_window(1024), torch.hann_window(1024).numpy(), atol=5e-7)


@pytest.mark.smoke
def test_stft_matches_torch():
    audio = make_audio()
    ref = torch_magspec(audio).numpy()
    ours = np.asarray(stft_magnitude(audio))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_mel_filterbank_slaney_properties():
    """Analytic checks of the slaney filterbank (no torchaudio available):
    triangle peaks at the mel-spaced center freqs, slaney 2/bandwidth norm."""
    fb = mel_filterbank(80, 1024, 22050, 0.0, 8000.0)  # (513, 80)
    assert fb.shape == (513, 80)
    assert np.all(fb >= 0)
    # each filter integrates (over Hz) to ~1 after slaney normalization:
    # sum_f fb[f,m] * df ~ 1 where df = sr/2 / (n_freqs-1)
    df = (22050 / 2) / 512
    areas = fb.sum(axis=0) * df
    np.testing.assert_allclose(areas, 1.0, atol=0.06)
    # below 1 kHz centers are linearly spaced at 200/3 Hz per mel:
    # center of filter m is mel point m+1 of linspace(0, hz_to_mel(8000), 82)
    def hz_to_mel(f):
        import math
        if f < 1000:
            return 3 * f / 200
        return 15.0 + math.log(f / 1000) / (math.log(6.4) / 27)
    mels = np.linspace(0.0, hz_to_mel(8000.0), 82)
    centers_hz = np.where(mels < 15.0, 200 * mels / 3, 1000 * np.exp((mels - 15.0) * (np.log(6.4) / 27)))
    freqs = np.linspace(0, 11025, 513)
    for m in (0, 20, 50, 79):
        peak_bin = fb[:, m].argmax()
        assert abs(freqs[peak_bin] - centers_hz[m + 1]) < 22050 / 1024  # within one bin


@pytest.mark.smoke
def test_full_pipeline_matches_reference_numerics():
    import torch

    audio = make_audio(seed=3)
    magspec = torch_magspec(audio)
    fb = torch.from_numpy(mel_filterbank(80, 1024, 22050, 0.0, 8000.0))
    melspec = torch.matmul(magspec.transpose(0, 1), fb).transpose(0, 1)
    ref_logmel = torch.log(torch.clamp_min(melspec, 1e-5)).numpy()
    ref_energy = torch.norm(magspec, dim=0).numpy()

    logmel, energy = mel_spectrogram_and_energy(audio)
    np.testing.assert_allclose(np.asarray(logmel), ref_logmel, atol=5e-4)
    np.testing.assert_allclose(np.asarray(energy), ref_energy, atol=5e-4, rtol=1e-5)


def test_batched_pipeline():
    a = np.stack([make_audio(seed=i) for i in range(3)])
    logmel, energy = mel_spectrogram_and_energy(a)
    assert logmel.shape[0] == 3 and logmel.shape[1] == 80
    assert energy.shape == (3, logmel.shape[2])
    one, e_one = mel_spectrogram_and_energy(a[1])
    np.testing.assert_allclose(np.asarray(logmel[1]), np.asarray(one), atol=1e-5)


def test_kaiser_resampler_antialiases():
    """48k -> 22.05k (the VCTK path): a tone below the target Nyquist passes
    cleanly; a tone above it is suppressed (linear interp aliases it back)."""
    from masg_tpu.audio.wavio import resample_kaiser, resample_linear

    sr_in, sr_out = 48000, 22050
    t = np.arange(sr_in) / sr_in

    # passband tone
    tone = np.sin(2 * np.pi * 3000 * t).astype(np.float32)
    out = resample_kaiser(tone, sr_in, sr_out)
    assert abs(len(out) - sr_out) <= 2
    tt = np.arange(len(out)) / sr_out
    ref = np.sin(2 * np.pi * 3000 * tt)
    # ignore filter edges
    e = 2000
    corr = np.corrcoef(out[e:-e], ref[e:-e])[0, 1]
    assert corr > 0.999, corr
    # amplitude must be preserved (regression: double-applied polyphase gain
    # scaled output by `up`=147)
    assert 0.95 < np.abs(out[e:-e]).max() < 1.05, np.abs(out).max()

    # stopband tone (15 kHz > 11.025 kHz Nyquist) must be attenuated
    hiss = np.sin(2 * np.pi * 15000 * t).astype(np.float32)
    out_hiss = resample_kaiser(hiss, sr_in, sr_out)
    out_lin = resample_linear(hiss, sr_in, sr_out)
    assert np.sqrt(np.mean(out_hiss[e:-e] ** 2)) < 0.01      # killed by the filter
    assert np.sqrt(np.mean(out_lin[e:-e] ** 2)) > 0.1        # aliased by interp
