"""Attribute-probe math (masg_tpu/eval/attribute_probe.py): axis projection,
non-circular separation, chunked wav embedding, acoustic F0 score."""

import numpy as np
import pytest

from masg_tpu.eval.attribute_probe import (AttributeAxes, embed_wavs,
                                           mean_voiced_f0)


def _corner_cloud(rng, center, n=6, d=8, spread=0.05):
    return center + spread * rng.normal(size=(n, d))


@pytest.mark.smoke
def test_axes_projection_recovers_mixture():
    rng = np.random.default_rng(0)
    d = 8
    m_dir = np.zeros(d); m_dir[0] = 1.0
    f_dir = np.zeros(d); f_dir[0] = -1.0
    ja_dir = np.zeros(d); ja_dir[1] = 1.0
    en_dir = np.zeros(d); en_dir[1] = -1.0
    corners = {
        "M_ja": m_dir + ja_dir, "F_ja": f_dir + ja_dir,
        "M_en": m_dir + en_dir, "F_en": f_dir + en_dir,
    }
    axes = AttributeAxes({k: _corner_cloud(rng, v) for k, v in corners.items()})
    # a point 30% of the way M -> F scores ~0.3 on gender, and its language
    # coordinate is independent
    p = 0.7 * corners["M_ja"] + 0.3 * corners["F_ja"]
    assert abs(float(axes.gender_score(p[None])[0]) - 0.3) < 0.05
    assert abs(float(axes.language_score(p[None])[0]) - 0.0) < 0.05


@pytest.mark.smoke
def test_separation_of_is_not_circular():
    """The fitting set always has margin 1.0 by construction; separation_of
    on INDEPENDENT noise must report a near-zero margin."""
    rng = np.random.default_rng(1)
    fit = {k: rng.normal(size=(6, 8)) for k in ("M_ja", "F_ja", "M_en", "F_en")}
    axes = AttributeAxes(fit)
    assert abs(axes.separation()["gender_margin"] - 1.0) < 1e-6
    indep = {k: rng.normal(size=(50, 8)) for k in fit}
    sep = axes.separation_of(indep)
    assert abs(sep["gender_margin"]) < 0.5  # noise: no real margin


@pytest.mark.smoke
def test_embed_wavs_shapes_and_norm():
    import jax.numpy as jnp

    class _StubEmbedder:
        def apply(self, variables, x, deterministic=True):
            # deterministic projection of the chunk mean: embedding dim 4
            # (jnp ops: ge2e_embed_mels jits this apply)
            m = jnp.mean(x, axis=(1, 2))
            out = jnp.stack([m, m + 1, m * 2, jnp.ones_like(m)], -1)
            return {"embeddings": out}

    rng = np.random.default_rng(2)
    wavs = [rng.normal(size=60000).astype(np.float32),
            rng.normal(size=22050).astype(np.float32)]  # 1 s: single pad chunk
    embs = embed_wavs(_StubEmbedder(), {}, wavs)
    assert embs.shape == (2, 4)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=-1), 1.0, rtol=1e-5)


@pytest.mark.smoke
def test_mean_voiced_f0_tracks_tone():
    t = np.arange(22050) / 22050.0
    for f0 in (120.0, 210.0):
        x = np.sin(2 * np.pi * f0 * t) + 0.3 * np.sin(2 * np.pi * 2 * f0 * t)
        est = mean_voiced_f0(x)
        assert abs(est - f0) < 0.03 * f0, (f0, est)
    assert mean_voiced_f0(np.zeros(22050)) == 0.0
