"""Streaming vocoder: receptive-field-exact chunking must reproduce the full
vocode bit-for-bit at the int16 output (interior chunks see >= the
generator's mel-frame receptive field of real context; boundary chunks keep
the true utterance edges so the generator's own zero padding matches the
full run)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def vocoder():
    from masg_tpu.infer.vocoder import Vocoder
    from masg_tpu.models.hifigan import HiFiGANGenerator

    gen = HiFiGANGenerator()
    mel = jnp.zeros((1, 8, 80))
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    # boost the init kernels: at the default 0.01-normal init the impulse
    # response decays within a couple of frames, which would make the
    # exactness assertions vacuous (any context would "work") — the
    # too-small-context sanity test below requires visible long-range
    # dependence
    params = jax.tree.map(
        lambda x: x * 3.0 if x.ndim == 3 else x, params)
    return Vocoder(gen, params)


@pytest.mark.parametrize("t", [700, 576, 193, 100])
def test_streaming_matches_full(vocoder, t):
    """Concatenated stream == full vocode for ragged tails (700), an exact
    multiple of chunk (576 = 3*192), a barely-two-chunk length, and the
    single-chunk short-input path (100 <= K + 2C)."""
    from masg_tpu.infer.vocoder import vocode_streaming, vocoder_infer

    rng = np.random.default_rng(t)
    mel = jnp.asarray(rng.normal(size=(1, t, 80)).astype(np.float32))

    full = vocoder_infer(mel, vocoder)[0]
    chunks = list(vocode_streaming(vocoder, mel, chunk_frames=192,
                                   context_frames=24))
    stream = np.concatenate(chunks)

    assert stream.shape == full.shape
    # int16 output: identical up to at most 1 LSB on rounding knife-edges
    # (XLA may schedule the chunked convs with different f32 reassociation)
    diff = np.abs(stream.astype(np.int32) - full.astype(np.int32))
    assert diff.max() <= 1, f"max int16 diff {diff.max()}"
    assert (diff > 0).mean() < 0.01

    if t > 192 + 2 * 24:
        assert len(chunks) >= 2
        assert len(chunks[0]) == 192 * vocoder.hop_length


def test_context_smaller_than_receptive_field_diverges(vocoder):
    """Sanity that the test can fail: with context far below the receptive
    field the interior chunks must NOT match — proving the equality above
    measures the context machinery, not some triviality."""
    from masg_tpu.infer.vocoder import vocode_streaming, vocoder_infer

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(1, 700, 80)).astype(np.float32))
    full = vocoder_infer(mel, vocoder)[0]
    stream = np.concatenate(list(vocode_streaming(
        vocoder, mel, chunk_frames=192, context_frames=2)))
    diff = np.abs(stream.astype(np.int32) - full.astype(np.int32))
    assert diff.max() > 1


def test_measured_receptive_field_and_default_context(vocoder):
    """context_frames=None measures the loaded generator's receptive field
    (impulse support) instead of assuming the stock architecture; the
    default-context stream must match the full vocode."""
    from masg_tpu.infer.vocoder import (measure_receptive_field_frames,
                                        vocode_streaming, vocoder_infer)

    rf = measure_receptive_field_frames(vocoder)
    assert 1 <= rf <= 64
    assert vocoder._rf_frames == rf  # cached

    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.normal(size=(1, 500, 80)).astype(np.float32))
    full = vocoder_infer(mel, vocoder)[0]
    stream = np.concatenate(list(vocode_streaming(vocoder, mel,
                                                  chunk_frames=128)))
    diff = np.abs(stream.astype(np.int32) - full.astype(np.int32))
    assert diff.max() <= 1


def test_short_input_reuses_interior_shape(vocoder):
    """2C < t <= K+2C inputs stream as TWO edge-aligned windows of the fixed
    interior shape (no per-length compile on the request path) and still
    match the full vocode; t <= 2C falls back to an own-length vocode."""
    from masg_tpu.infer.vocoder import vocode_streaming, vocoder_infer

    rng = np.random.default_rng(4)
    for t, expect_chunks in ((100, 2), (40, 1)):
        mel = jnp.asarray(rng.normal(size=(1, t, 80)).astype(np.float32))
        full = vocoder_infer(mel, vocoder)[0]
        chunks = list(vocode_streaming(vocoder, mel, chunk_frames=192,
                                       context_frames=24))
        assert len(chunks) == expect_chunks, (t, len(chunks))
        stream = np.concatenate(chunks)
        assert stream.shape == full.shape
        diff = np.abs(stream.astype(np.int32) - full.astype(np.int32))
        assert diff.max() <= 1, (t, diff.max())


def test_invalid_chunk_params(vocoder):
    from masg_tpu.infer.vocoder import vocode_streaming

    mel = jnp.zeros((1, 300, 80))
    with pytest.raises(ValueError, match="chunk_frames"):
        next(vocode_streaming(vocoder, mel, chunk_frames=0, context_frames=8))


def test_melgan_streaming():
    """The measured-context path adapts to a different architecture
    (MelGAN: reflection padding, its own receptive field)."""
    from masg_tpu.infer.vocoder import Vocoder, vocode_streaming, vocoder_infer
    from masg_tpu.models.melgan import MelGANGenerator

    gen = MelGANGenerator()
    params = gen.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 80)))["params"]
    params = jax.tree.map(lambda x: x * 2.0 if x.ndim == 3 else x, params)
    v = Vocoder(gen, params, mel_scale=1.0)
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.normal(size=(1, 400, 80)).astype(np.float32))
    full = vocoder_infer(mel, v)[0]
    stream = np.concatenate(list(vocode_streaming(v, mel, chunk_frames=128)))
    assert stream.shape == full.shape
    diff = np.abs(stream.astype(np.int32) - full.astype(np.int32))
    assert diff.max() <= 1
