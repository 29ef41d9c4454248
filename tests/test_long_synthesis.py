"""Unbounded-length synthesis (beyond reference parity: the reference
decoder truncates everything past max_seq_len=1000 frames,
transformer/Models.py:166-174; masg_tpu chunks at pause phones and
stitches)."""

import jax
import jax.numpy as jnp
import numpy as np

from test_fastspeech2 import tiny_config
from test_serving import _biased_variables


def test_chunk_phone_ids_properties():
    from masg_tpu.infer.synthesis import chunk_phone_ids

    pause = frozenset({357})
    ids = list(range(5, 45)) + [357] + list(range(50, 90)) + [357] + list(range(100, 140))
    acc = list(range(len(ids)))
    chunks = chunk_phone_ids(ids, acc, max_phones=50, pause_ids=pause)
    # concatenation reproduces the input exactly (ids AND accents)
    flat_ids = [i for c, _ in chunks for i in c]
    flat_acc = [a for _, ca in chunks for a in ca]
    assert flat_ids == ids and flat_acc == acc
    # prefers the pause boundary: first chunk ends with the pause phone
    assert chunks[0][0][-1] == 357
    # every chunk respects the cap
    assert all(len(c) <= 50 for c, _ in chunks)

    # no pauses at all -> hard splits at exactly max_phones
    chunks = chunk_phone_ids(list(range(5, 105)), None, max_phones=30,
                             pause_ids=pause)
    assert [len(c) for c, _ in chunks] == [30, 30, 30, 10]
    assert all(a is None for _, a in chunks)


def test_synthesize_long_stitches_chunks():
    from masg_tpu.infer.synthesis import synthesize_long
    from masg_tpu.models import FastSpeech2

    cfg = tiny_config()
    model = FastSpeech2.from_config(cfg)
    variables = _biased_variables(model, cfg)

    ids = list(range(5, 29))  # 24 phones -> 2 chunks at max_phones=12
    long = synthesize_long(model, variables, ids, max_phones=12,
                           max_mel_len=64,
                           meta_dim=cfg.preprocess.speaker_generation.one_hot_dim)
    assert long["n_chunks"] == 2
    assert long["mel"].shape == (long["mel_len"], 80)
    assert long["mel_len"] > 0 and np.isfinite(long["mel"]).all()

    # the stitched mel equals the concatenation of independent chunk runs
    parts = []
    for chunk in (ids[:12], ids[12:]):
        r = synthesize_long(model, variables, chunk, max_phones=12,
                            max_mel_len=64,
                            meta_dim=cfg.preprocess.speaker_generation.one_hot_dim)
        parts.append(r["mel"])
    np.testing.assert_allclose(long["mel"], np.concatenate(parts, 0),
                               atol=2e-4)


def test_synthesize_long_vocodes():
    from masg_tpu.infer.synthesis import synthesize_long
    from masg_tpu.infer.vocoder import Vocoder
    from masg_tpu.models import FastSpeech2
    from masg_tpu.models.hifigan import HiFiGANGenerator

    cfg = tiny_config()
    model = FastSpeech2.from_config(cfg)
    variables = _biased_variables(model, cfg)
    gen = HiFiGANGenerator(upsample_initial_channel=32)
    voc = Vocoder(gen, gen.init(jax.random.PRNGKey(1),
                                jnp.zeros((1, 8, 80)))["params"])

    r = synthesize_long(model, variables, list(range(5, 21)), max_phones=8,
                        max_mel_len=64, vocoder=voc,
                        meta_dim=cfg.preprocess.speaker_generation.one_hot_dim)
    assert r["wav"].dtype == np.int16
    assert r["wav"].shape == (r["mel_len"] * 256,)


def test_bf16_vocoder_accepts_f32_mel():
    """A bf16 vocoder must accept the f32 stitched mel synthesize_long
    hands over (caught on real TPU: dtype mismatch in the first conv)."""
    from masg_tpu.infer.vocoder import Vocoder, vocoder_infer
    from masg_tpu.models.hifigan import HiFiGANGenerator

    gen = HiFiGANGenerator(upsample_initial_channel=32, dtype=jnp.bfloat16)
    params = gen.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, 80), jnp.bfloat16))["params"]
    voc = Vocoder(gen, params)
    mel = jnp.asarray(np.random.default_rng(0).normal(size=(1, 9, 80)),
                      jnp.float32)
    wavs = vocoder_infer(mel, voc)
    assert wavs[0].shape == (9 * 256,) and wavs[0].dtype == np.int16
