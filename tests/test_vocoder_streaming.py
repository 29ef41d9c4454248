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
