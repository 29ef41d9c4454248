"""Pallas flash-attention kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from masg_tpu.ops.attention import flash_attention, mha_attention


def test_flash_matches_xla_interpret():
    B, H, T, Dh = 2, 2, 256, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    lengths = jnp.asarray([256, 100], jnp.int32)
    pad = jnp.arange(T)[None, :] >= lengths[:, None]

    ref = np.asarray(mha_attention(q, k, v, pad))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flash_attention(q, k, v, lengths))

    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_flash_ragged_and_padding():
    """Non-multiple-of-block T and very short sequences."""
    B, H, T, Dh = 3, 1, 200, 32  # T=200 pads to 256 internally
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    lengths = jnp.asarray([200, 64, 3], jnp.int32)
    pad = jnp.arange(T)[None, :] >= lengths[:, None]

    ref = np.asarray(mha_attention(q, k, v, pad))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flash_attention(q, k, v, lengths))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_fastspeech2_with_flash_matches_xla():
    """FastSpeech2(use_flash=True) == use_flash=False on identical params."""
    import sys

    sys.path.insert(0, "tests")
    from test_fastspeech2 import make_batch, tiny_config

    from masg_tpu.models import FastSpeech2

    cfg = tiny_config()
    rng = np.random.default_rng(3)
    b = make_batch(rng)
    m_ref = FastSpeech2.from_config(cfg, use_flash=False)
    m_flash = FastSpeech2.from_config(cfg, use_flash=True)

    variables = m_ref.init(
        jax.random.PRNGKey(0),
        b["speakers"], b["texts"], b["src_lens"], b["max_mel_len"],
        mel_lens=b["mel_lens"], p_targets=b["p_targets"], e_targets=b["e_targets"],
        d_targets=b["d_targets"], accents=b["accents"], speaker_meta=b["speaker_meta"],
    )
    kwargs = dict(
        mel_lens=b["mel_lens"], p_targets=b["p_targets"], e_targets=b["e_targets"],
        d_targets=b["d_targets"], accents=b["accents"], speaker_meta=b["speaker_meta"],
    )
    ref = m_ref.apply(variables, b["speakers"], b["texts"], b["src_lens"],
                      b["max_mel_len"], **kwargs)
    with pltpu.force_tpu_interpret_mode():
        out = m_flash.apply(variables, b["speakers"], b["texts"], b["src_lens"],
                            b["max_mel_len"], **kwargs)
    np.testing.assert_allclose(np.asarray(out.mel), np.asarray(ref.mel), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out.postnet_mel), np.asarray(ref.postnet_mel), atol=2e-4
    )


def test_use_flash_model_forward_matches_xla_path():
    """FastSpeech2 forward with use_flash=True (auto interpret mode off-TPU)
    matches the XLA attention path — the --flash CLI flag's contract."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _example_inputs, _flagship
    from masg_tpu.models import FastSpeech2

    cfg = _flagship()
    cfg.model.transformer.encoder_layer = 1
    cfg.model.transformer.decoder_layer = 1
    b = _example_inputs(B=2, L=32, T=128)

    def run(use_flash):
        model = FastSpeech2.from_config(cfg, use_flash=use_flash)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(b["speakers"]), jnp.asarray(b["texts"]),
            jnp.asarray(b["src_lens"]), 128,
            d_targets=jnp.asarray(b["durations"]),
            accents=jnp.asarray(b["accents"]),
            speaker_meta=jnp.asarray(b["speaker_meta"]),
        )
        out = model.apply(
            variables, jnp.asarray(b["speakers"]), jnp.asarray(b["texts"]),
            jnp.asarray(b["src_lens"]), 128,
            d_targets=jnp.asarray(b["durations"]),
            accents=jnp.asarray(b["accents"]),
            speaker_meta=jnp.asarray(b["speaker_meta"]),
        )
        return np.asarray(out.postnet_mel)

    np.testing.assert_allclose(run(True), run(False), atol=5e-5)


def test_flash_grad_matches_xla():
    """Custom-VJP backward (Pallas dQ/dKV kernels) matches XLA attention grads.

    Contract: cotangents at padded QUERY rows are zero (the model masks pads
    downstream of every FFT block, so their gradients never flow back) — dK/dV
    contributions from garbage query rows are dropped by the kernel, and dQ at
    those rows is don't-care.
    """
    B, H, T, Dh = 2, 2, 200, 64
    rng = np.random.default_rng(7)
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32) for _ in range(3)
    )
    lengths = jnp.asarray([200, 77], jnp.int32)
    pad = jnp.arange(T)[None, :] >= lengths[:, None]
    valid = (~pad)[:, None, :, None]
    do = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32) * valid

    gx = jax.grad(lambda q, k, v: jnp.sum(mha_attention(q, k, v, pad) * do),
                  argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(lambda q, k, v: jnp.sum(flash_attention(q, k, v, lengths) * do),
                      argnums=(0, 1, 2))(q, k, v)

    np.testing.assert_allclose(np.asarray(gf[0]) * valid, np.asarray(gx[0]) * valid,
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gx[1]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(gx[2]), atol=5e-3)


def test_flash_train_step_runs():
    """--flash is trainable: jax.grad through the model with use_flash=True
    (used to raise NotImplementedError — pallas_call has no built-in VJP)."""
    import sys

    sys.path.insert(0, "tests")
    from test_fastspeech2 import make_batch, tiny_config

    from masg_tpu.models import FastSpeech2

    cfg = tiny_config()
    rng = np.random.default_rng(11)
    b = make_batch(rng)
    m_ref = FastSpeech2.from_config(cfg, use_flash=False)
    m_flash = FastSpeech2.from_config(cfg, use_flash=True)

    variables = m_ref.init(
        jax.random.PRNGKey(0),
        b["speakers"], b["texts"], b["src_lens"], b["max_mel_len"],
        mel_lens=b["mel_lens"], p_targets=b["p_targets"], e_targets=b["e_targets"],
        d_targets=b["d_targets"], accents=b["accents"], speaker_meta=b["speaker_meta"],
    )

    def loss(params, model):
        out = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            b["speakers"], b["texts"], b["src_lens"], b["max_mel_len"],
            mel_lens=b["mel_lens"], p_targets=b["p_targets"],
            e_targets=b["e_targets"], d_targets=b["d_targets"],
            accents=b["accents"], speaker_meta=b["speaker_meta"],
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )[0]
        mask = (~out.mel_pad_mask)[..., None]
        return jnp.sum(jnp.abs(out.postnet_mel) * mask) / jnp.sum(mask)

    g_ref = jax.grad(loss)(variables["params"], m_ref)
    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss)(variables["params"], m_flash)

    # same param tree, finite everywhere, and close to the XLA-path grads
    ref_leaves = jax.tree.leaves(g_ref)
    flash_leaves = jax.tree.leaves(g_flash)
    assert len(ref_leaves) == len(flash_leaves)
    for a, b_ in zip(ref_leaves, flash_leaves):
        assert np.all(np.isfinite(np.asarray(b_)))
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=2e-3)
