"""Round-trip ingestion of the reference's torch-saved speaker distributions
(VERDICT r1 item 7).

The reference workflow saves `model.distributions.InterpolateGMM` /
`BarycenterGMM` instances with torch.save and reloads them in
examples_gen_distri.py:207-215. Those classes don't exist in this framework,
so `load_distribution` must unpickle them with stub classes and lift the
torch tensors into a DiagGMM. The test fabricates a .pth exactly that way:
define the class under a fake `model.distributions` module, torch.save an
instance, DELETE the module, then load.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _make_reference_style_pth(path, seed=0):
    """torch.save an InterpolateGMM-style MixtureSameFamily subclass under
    the reference's module path, then remove the module (as if we were in a
    different repo)."""
    import torch.distributions as D

    mod = types.ModuleType("model.distributions")

    class InterpolateGMM(D.MixtureSameFamily):
        pass

    InterpolateGMM.__module__ = "model.distributions"
    InterpolateGMM.__qualname__ = "InterpolateGMM"
    mod.InterpolateGMM = InterpolateGMM
    pkg = types.ModuleType("model")
    pkg.distributions = mod
    sys.modules["model"] = pkg
    sys.modules["model.distributions"] = mod
    try:
        g = torch.Generator().manual_seed(seed)
        k, d = 3, 8
        pi = torch.softmax(torch.rand(k, generator=g), dim=-1)
        mu = torch.randn(k, d, generator=g)
        sigma = torch.rand(k, d, generator=g) + 0.3
        dist = InterpolateGMM(
            D.Categorical(pi), D.Independent(D.Normal(mu, sigma), 1)
        )
        torch.save(dist, path)
        return pi.numpy(), mu.numpy(), sigma.numpy()
    finally:
        del sys.modules["model"]
        del sys.modules["model.distributions"]


def test_load_reference_pth_roundtrip(tmp_path):
    from masg_tpu.cli.examples_gen_distri import load_distribution

    pth = str(tmp_path / "distri_n_new.pth")
    pi, mu, sigma = _make_reference_style_pth(pth)

    # the reference module must really be gone
    with pytest.raises(ModuleNotFoundError):
        import model.distributions  # noqa: F401

    gmm = load_distribution(pth)
    np.testing.assert_allclose(np.asarray(gmm.pi), pi, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gmm.mu), mu, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gmm.sigma), sigma, rtol=1e-6)


def test_ingested_distribution_moments_match_torch(tmp_path):
    """Samples drawn from the converted DiagGMM match the torch
    distribution's analytic mean within Monte-Carlo error."""
    import jax

    from masg_tpu.cli.examples_gen_distri import load_distribution
    from masg_tpu.ops.gmm import mean as gmm_mean, sample as gmm_sample

    pth = str(tmp_path / "distri.pth")
    pi, mu, sigma = _make_reference_style_pth(pth, seed=3)
    gmm = load_distribution(pth)

    analytic = (pi[:, None] * mu).sum(0)
    np.testing.assert_allclose(np.asarray(gmm_mean(gmm)), analytic, rtol=1e-5)

    draws = np.asarray(gmm_sample(gmm, jax.random.PRNGKey(0), (4000,)))
    assert draws.shape == (4000, mu.shape[1])
    np.testing.assert_allclose(draws.mean(0), analytic, atol=0.12)
