"""FastSpeech2 model-level tests: init, teacher-forced and free-running
forwards, speaker prior, loss finiteness."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from masg_tpu.core.config import ExperimentConfig, ModelConfig, PreprocessConfig, Stats, TrainConfig
from masg_tpu.models import FastSpeech2, fastspeech2_loss, speaker_prior_log_prob
from masg_tpu.ops import gmm as _  # noqa: F401
from masg_tpu.ops.gmm import sample as gmm_sample


def tiny_config(n_speakers=4):
    cfg = ExperimentConfig(
        preprocess=PreprocessConfig(),
        model=ModelConfig(),
        train=TrainConfig(),
        stats=Stats(pitch=(-2.0, 9.0, 0.0, 1.0), energy=(-1.5, 8.0, 0.0, 1.0)),
        speakers={f"spk{i}": [i, "M", "ja"] for i in range(n_speakers)},
    )
    # shrink for test speed
    cfg.model.transformer.encoder_layer = 2
    cfg.model.transformer.decoder_layer = 2
    cfg.model.transformer.encoder_hidden = 64
    cfg.model.transformer.decoder_hidden = 64
    cfg.model.transformer.conv_filter_size = 128
    cfg.model.variance_predictor.filter_size = 64
    return cfg


def make_batch(rng, B=2, L=11, T=40, n_mels=80, meta_dim=4):
    texts = rng.integers(1, 100, size=(B, L)).astype(np.int32)
    src_lens = np.full(B, L, dtype=np.int32)
    src_lens[1::2] = L - 3  # every other item shorter, pads zeroed
    for i in range(B):
        texts[i, src_lens[i]:] = 0
    accents = rng.integers(0, 5, size=(B, L)).astype(np.int32)
    durations = rng.integers(1, 5, size=(B, L)).astype(np.int32)
    for i in range(B):
        durations[i, src_lens[i]:] = 0
    mel_lens = durations.sum(axis=1).astype(np.int32)
    T = int(mel_lens.max())
    mels = rng.normal(size=(B, T, n_mels)).astype(np.float32)
    pitches = rng.normal(size=(B, L)).astype(np.float32)
    energies = rng.normal(size=(B, L)).astype(np.float32)
    speakers = (np.arange(B) % 4).astype(np.int32)
    meta = np.zeros((B, meta_dim), dtype=np.float32)
    meta[:, 0] = 1.0
    meta[:, 2] = 1.0
    return dict(
        speakers=jnp.asarray(speakers),
        texts=jnp.asarray(texts),
        src_lens=jnp.asarray(src_lens),
        mels=jnp.asarray(mels),
        mel_lens=jnp.asarray(mel_lens),
        p_targets=jnp.asarray(pitches),
        e_targets=jnp.asarray(energies),
        d_targets=jnp.asarray(durations),
        accents=jnp.asarray(accents),
        speaker_meta=jnp.asarray(meta),
        max_mel_len=T,
    )


@pytest.mark.smoke
def test_forward_teacher_forced_and_loss():
    cfg = tiny_config()
    model = FastSpeech2.from_config(cfg)
    rng = np.random.default_rng(0)
    b = make_batch(rng)

    variables = model.init(
        jax.random.PRNGKey(0),
        b["speakers"], b["texts"], b["src_lens"], b["max_mel_len"],
        mel_lens=b["mel_lens"], p_targets=b["p_targets"], e_targets=b["e_targets"],
        d_targets=b["d_targets"], accents=b["accents"], speaker_meta=b["speaker_meta"],
    )
    out = model.apply(
        variables,
        b["speakers"], b["texts"], b["src_lens"], b["max_mel_len"],
        mel_lens=b["mel_lens"], p_targets=b["p_targets"], e_targets=b["e_targets"],
        d_targets=b["d_targets"], accents=b["accents"], speaker_meta=b["speaker_meta"],
    )
    T = b["max_mel_len"]
    assert out.mel.shape == (2, T, 80)
    assert out.postnet_mel.shape == (2, T, 80)
    assert out.speaker_gmm is not None and out.speaker_emb.shape == (2, 64)
    np.testing.assert_array_equal(np.asarray(out.mel_len), np.asarray(b["mel_lens"]))

    losses = fastspeech2_loss(
        out, b["mels"], b["p_targets"], b["e_targets"], b["d_targets"]
    )
    for v in losses:
        assert np.isfinite(float(v))

    elp = speaker_prior_log_prob(out.speaker_emb, out.speaker_gmm)
    assert np.isfinite(float(elp))


@pytest.mark.smoke
def test_forward_inference_predicted_durations():
    cfg = tiny_config()
    model = FastSpeech2.from_config(cfg)
    rng = np.random.default_rng(1)
    b = make_batch(rng)

    variables = model.init(
        jax.random.PRNGKey(0),
        b["speakers"], b["texts"], b["src_lens"], 64,
        accents=b["accents"], speaker_meta=b["speaker_meta"],
    )
    out = model.apply(
        variables,
        b["speakers"], b["texts"], b["src_lens"], 64,
        accents=b["accents"], speaker_meta=b["speaker_meta"], d_control=1.2,
    )
    assert out.mel.shape == (2, 64, 80)
    # predicted mel_len bounded by the bucket cap
    assert np.all(np.asarray(out.mel_len) <= 64)
    # mask/lengths consistency
    valid = ~np.asarray(out.mel_pad_mask)
    np.testing.assert_array_equal(valid.sum(1), np.asarray(out.mel_len))


def test_speaker_generation_and_from_emb():
    cfg = tiny_config()
    model = FastSpeech2.from_config(cfg)
    rng = np.random.default_rng(2)
    b = make_batch(rng)
    variables = model.init(
        jax.random.PRNGKey(0),
        b["speakers"], b["texts"], b["src_lens"], 32,
        accents=b["accents"], speaker_meta=b["speaker_meta"],
    )
    # sample a brand-new speaker from the metadata-conditioned prior
    gmm = model.apply(variables, b["speaker_meta"][:1], method=FastSpeech2.speaker_distribution)
    emb = gmm_sample(gmm, jax.random.PRNGKey(7))  # (1, 64)
    assert emb.shape == (1, 64)

    out = model.apply(
        variables,
        b["texts"][:1], b["src_lens"][:1], 32, jnp.asarray(emb),
        accents=b["accents"][:1],
        method=FastSpeech2.synthesize_from_speaker_emb,
    )
    assert out.mel.shape == (1, 32, 80)


def test_param_count_reasonable():
    cfg = tiny_config()
    cfg.model.transformer.encoder_hidden = 256
    cfg.model.transformer.decoder_hidden = 256
    cfg.model.transformer.encoder_layer = 4
    cfg.model.transformer.decoder_layer = 6
    cfg.model.transformer.conv_filter_size = 1024
    cfg.model.variance_predictor.filter_size = 256
    model = FastSpeech2.from_config(cfg)
    rng = np.random.default_rng(0)
    b = make_batch(rng)
    variables = model.init(
        jax.random.PRNGKey(0),
        b["speakers"], b["texts"], b["src_lens"], b["max_mel_len"],
        mel_lens=b["mel_lens"], p_targets=b["p_targets"], e_targets=b["e_targets"],
        d_targets=b["d_targets"], accents=b["accents"], speaker_meta=b["speaker_meta"],
    )
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    # reference prints ~35M params (train.py:92) at this config
    assert 25e6 < n < 45e6, n


def test_jdit_path():
    """use_jdit: teacher mel + alignments come back; train step consumes them."""
    import jax

    cfg = tiny_config()
    cfg.model.jdit.use_jdit = True
    model = FastSpeech2.from_config(cfg)
    rng = np.random.default_rng(5)
    b = make_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b["speakers"], b["texts"], b["src_lens"], b["max_mel_len"],
        mels=b["mels"], mel_lens=b["mel_lens"], p_targets=b["p_targets"],
        e_targets=b["e_targets"], d_targets=b["d_targets"],
        accents=b["accents"], speaker_meta=b["speaker_meta"],
    )
    out = model.apply(
        variables,
        b["speakers"], b["texts"], b["src_lens"], b["max_mel_len"],
        mels=b["mels"], mel_lens=b["mel_lens"], p_targets=b["p_targets"],
        e_targets=b["e_targets"], d_targets=b["d_targets"],
        accents=b["accents"], speaker_meta=b["speaker_meta"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    T = b["max_mel_len"]
    assert out.mel_jdit.shape == (2, T, 80)
    assert out.alignments.shape == (2, T, b["texts"].shape[1])
    align = np.asarray(out.alignments)
    np.testing.assert_allclose(align.sum(-1), 1.0, atol=1e-4)

    from masg_tpu.models.jdit import attention_to_duration

    d = attention_to_duration(out.alignments, out.src_len)
    assert np.asarray(d).sum(1).tolist() == [T, T]


def test_jdit_train_step_decreases():
    import jax

    from masg_tpu.train.optim import make_optimizer
    from masg_tpu.train.state import create_train_state
    from masg_tpu.train.step import make_train_step

    cfg = tiny_config()
    cfg.model.jdit.use_jdit = True
    cfg.train.optimizer.warm_up_step = 50
    model = FastSpeech2.from_config(cfg)
    rng = np.random.default_rng(6)
    b = make_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b["speakers"], b["texts"], b["src_lens"], b["max_mel_len"],
        mels=b["mels"], mel_lens=b["mel_lens"], p_targets=b["p_targets"],
        e_targets=b["e_targets"], d_targets=b["d_targets"],
        accents=b["accents"], speaker_meta=b["speaker_meta"],
    )
    tx = make_optimizer(cfg.train.optimizer, cfg.model.transformer.encoder_hidden)
    state = create_train_state(model, variables, tx)
    step_fn = jax.jit(make_train_step(model, use_jdit=True))
    sb = dict(speakers=b["speakers"], texts=b["texts"], src_lens=b["src_lens"],
              mels=b["mels"], mel_lens=b["mel_lens"], pitches=b["p_targets"],
              energies=b["e_targets"], durations=b["d_targets"],
              accents=b["accents"], speaker_meta=b["speaker_meta"])
    key = jax.random.PRNGKey(0)
    first = None
    for i in range(8):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, sb, sub)
        if first is None:
            first = float(metrics.total)
    assert np.isfinite(float(metrics.total))
