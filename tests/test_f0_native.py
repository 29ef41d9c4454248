"""Native C++ DIO+StoneMask vs the numpy behavioural reference."""

import shutil

import numpy as np
import pytest

from masg_tpu.audio.f0 import dio, stonemask

from test_f0 import FRAME_PERIOD, SR, synth_tone

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ compiler in this environment"
)


def test_native_matches_numpy_dio():
    from masg_tpu.audio.f0_native import dio_native

    x = synth_tone(220.0, noise=0.01)
    ref, t = dio(x, SR, FRAME_PERIOD)
    out = dio_native(x, SR, FRAME_PERIOD)
    assert len(out) == len(ref)
    # voiced/unvoiced decisions agree on nearly all frames
    agree = np.mean((out > 0) == (ref > 0))
    assert agree > 0.97, agree
    both = (out > 0) & (ref > 0)
    np.testing.assert_allclose(out[both], ref[both], rtol=5e-3)


def test_native_stonemask_accuracy():
    from masg_tpu.audio.f0_native import dio_stonemask_native

    for f0_true in (132.5, 220.0, 287.0):
        x = synth_tone(f0_true, noise=0.01, seed=3)
        out = dio_stonemask_native(x, SR, FRAME_PERIOD)
        voiced = out[out > 0]
        assert len(voiced) > 0.6 * len(out)
        err = np.median(np.abs(voiced - f0_true)) / f0_true
        assert err < 0.005, (f0_true, err)


def test_native_unvoiced_noise():
    from masg_tpu.audio.f0_native import dio_stonemask_native

    rng = np.random.default_rng(1)
    x = 0.1 * rng.normal(size=SR)
    out = dio_stonemask_native(x, SR, FRAME_PERIOD)
    assert np.mean(out > 0) < 0.3


@pytest.mark.smoke
def test_extract_f0_prefers_native():
    from masg_tpu.audio.f0 import extract_f0

    x = synth_tone(180.0)
    out = extract_f0(x, SR, FRAME_PERIOD, use_native=True)
    voiced = out[out > 0]
    assert np.median(np.abs(voiced - 180.0)) / 180.0 < 0.005
