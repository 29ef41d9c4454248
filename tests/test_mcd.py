"""MCD metric tests."""

import numpy as np

from masg_tpu.utils.mcd import mcd, mel_to_mcep
import pytest

pytestmark = pytest.mark.smoke


def test_identical_is_zero():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(50, 80))
    assert mcd(m, m) == 0.0
    assert mcd(m, m, align="dtw") == 0.0


def test_scales_with_distortion():
    rng = np.random.default_rng(1)
    m = rng.normal(size=(60, 80))
    small = mcd(m, m + 0.05 * rng.normal(size=m.shape))
    large = mcd(m, m + 0.5 * rng.normal(size=m.shape))
    assert 0 < small < large


def test_dtw_handles_time_stretch():
    rng = np.random.default_rng(2)
    m = rng.normal(size=(40, 80))
    stretched = np.repeat(m, 2, axis=0)  # 2x slower, same content
    # truncation compares misaligned frames; DTW recovers the alignment
    assert mcd(m, stretched, align="dtw") < mcd(m, stretched, align="truncate")
    assert mcd(m, stretched, align="dtw") < 1e-6


def test_mcep_shape():
    assert mel_to_mcep(np.zeros((7, 80)), n_mfc=13).shape == (7, 13)
