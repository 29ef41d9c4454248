"""Unit tests for core ops: masks, positional encodings, length regulator,
attention, GMM — including golden checks against torch where the reference
used torch primitives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masg_tpu.ops import (
    DiagGMM,
    expand_scalars,
    log_prob,
    mha_attention,
    pad_mask_from_lengths,
    regulate_lengths,
    sample,
    sinusoid_table,
)

pytestmark = pytest.mark.smoke


def test_pad_mask():
    m = pad_mask_from_lengths(jnp.array([2, 4]), 5)
    expect = np.array(
        [[False, False, True, True, True], [False, False, False, False, True]]
    )
    np.testing.assert_array_equal(np.asarray(m), expect)


def test_sinusoid_table_matches_reference_formula():
    # reference transformer/Models.py:10-30
    n_pos, d = 37, 16
    pos = np.arange(n_pos)[:, None]
    dim = np.arange(d)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / d)
    ref = np.where(dim % 2 == 0, np.sin(angle), np.cos(angle))
    ours = np.asarray(sinusoid_table(n_pos, d))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_length_regulator_matches_python_loop():
    rng = np.random.default_rng(0)
    B, L, H, T = 3, 7, 4, 30
    x = rng.normal(size=(B, L, H)).astype(np.float32)
    dur = rng.integers(0, 5, size=(B, L)).astype(np.int32)
    # zero durations on "padded" tail phonemes
    dur[0, 5:] = 0
    dur[1, 6:] = 0

    out, mel_len = regulate_lengths(jnp.asarray(x), jnp.asarray(dur), T)
    out = np.asarray(out)

    for b in range(B):
        # python-loop reference semantics (modules.py:167-190 + pad)
        rows = [np.repeat(x[b, i : i + 1], dur[b, i], axis=0) for i in range(L)]
        expanded = np.concatenate(rows, axis=0) if rows else np.zeros((0, H))
        n = min(expanded.shape[0], T)
        assert int(mel_len[b]) == min(int(dur[b].sum()), T)
        np.testing.assert_allclose(out[b, :n], expanded[:n], atol=1e-6)
        np.testing.assert_allclose(out[b, n:], 0.0, atol=1e-6)


def test_expand_scalars():
    vals = jnp.array([[1.0, 2.0, 3.0]])
    dur = jnp.array([[2, 0, 3]])
    out = expand_scalars(vals, dur, 7)
    np.testing.assert_allclose(
        np.asarray(out[0]), [1.0, 1.0, 3.0, 3.0, 3.0, 0.0, 0.0], atol=1e-6
    )


def test_mha_attention_matches_naive():
    rng = np.random.default_rng(1)
    B, H, T, D = 2, 2, 9, 8
    q = rng.normal(size=(B, H, T, D)).astype(np.float32)
    k = rng.normal(size=(B, H, T, D)).astype(np.float32)
    v = rng.normal(size=(B, H, T, D)).astype(np.float32)
    lengths = np.array([9, 5])
    mask = np.arange(T)[None, :] >= lengths[:, None]

    out = np.asarray(mha_attention(*map(jnp.asarray, (q, k, v)), jnp.asarray(mask)))

    for b in range(B):
        for h in range(H):
            s = q[b, h] @ k[b, h].T / np.sqrt(D)
            s[:, mask[b]] = -1e30
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            np.testing.assert_allclose(out[b, h], p @ v[b, h], atol=1e-4)


def test_gmm_log_prob_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.distributions as D

    rng = np.random.default_rng(2)
    B, K, Dm = 4, 3, 6
    pi = rng.dirichlet(np.ones(K), size=B).astype(np.float32)
    mu = rng.normal(size=(B, K, Dm)).astype(np.float32)
    sigma = rng.uniform(0.5, 2.0, size=(B, K, Dm)).astype(np.float32)
    x = rng.normal(size=(B, Dm)).astype(np.float32)

    gmm = DiagGMM(jnp.asarray(pi), jnp.asarray(mu), jnp.asarray(sigma))
    ours = np.asarray(log_prob(gmm, jnp.asarray(x)))

    tg = D.MixtureSameFamily(
        D.Categorical(torch.tensor(pi)),
        D.Independent(D.Normal(torch.tensor(mu), torch.tensor(sigma)), 1),
    )
    ref = tg.log_prob(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_gmm_sample_statistics():
    key = jax.random.PRNGKey(0)
    pi = jnp.array([[0.7, 0.3]])
    mu = jnp.array([[[0.0, 0.0], [10.0, 10.0]]])
    sigma = jnp.array([[[0.1, 0.1], [0.1, 0.1]]])
    gmm = DiagGMM(pi, mu, sigma)
    s = sample(gmm, key, sample_shape=(2000,))  # (2000, 1, 2)
    frac_high = float(jnp.mean((s[..., 0] > 5).astype(jnp.float32)))
    assert 0.25 < frac_high < 0.35
    # deterministic under the same key
    s2 = sample(gmm, key, sample_shape=(2000,))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s2))
