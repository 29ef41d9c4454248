"""Pure-functional diagonal Gaussian mixture ops.

Replaces torch.distributions MixtureSameFamily(Categorical, Independent(Normal))
as used by the TacoSpawn speaker prior (reference model/fastspeech2.py:332-341).
A GMM is just a pytree triple (pi, mu, sigma); sampling takes an explicit PRNG
key (deterministic under jit).

Shapes: pi (..., K); mu, sigma (..., K, D).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_LOG_2PI = 1.8378770664093453  # log(2*pi)


class DiagGMM(NamedTuple):
    """Batched diagonal-covariance GMM parameters (a pytree)."""

    pi: jnp.ndarray  # (..., K) mixture weights, sum to 1
    mu: jnp.ndarray  # (..., K, D) component means
    sigma: jnp.ndarray  # (..., K, D) component stddevs (positive)


def component_log_prob(gmm: DiagGMM, x: jnp.ndarray) -> jnp.ndarray:
    """Per-component log N(x | mu_k, diag(sigma_k^2)). x: (..., D) -> (..., K)."""
    x = x[..., None, :]  # (..., 1, D)
    z = (x - gmm.mu) / gmm.sigma
    return jnp.sum(-0.5 * (z * z + _LOG_2PI) - jnp.log(gmm.sigma), axis=-1)


def log_prob(gmm: DiagGMM, x: jnp.ndarray) -> jnp.ndarray:
    """Mixture log density. x: (..., D) -> (...,).

    Matches torch MixtureSameFamily.log_prob: logsumexp_k(log pi_k + log N_k).
    """
    lp = component_log_prob(gmm, x)  # (..., K)
    log_pi = jnp.log(jnp.clip(gmm.pi, 1e-37, None))
    return jax.nn.logsumexp(log_pi + lp, axis=-1)


def sample(gmm: DiagGMM, key: jax.Array, sample_shape: Tuple[int, ...] = ()) -> jnp.ndarray:
    """Draw samples. Returns shape sample_shape + batch_shape + (D,).

    Mirrors torch MixtureSameFamily.sample (component by categorical, then a
    diagonal normal draw) with explicit PRNG threading.
    """
    k_cat, k_norm = jax.random.split(key)
    batch_shape = gmm.pi.shape[:-1]
    kk = gmm.pi.shape[-1]
    d = gmm.mu.shape[-1]

    logits = jnp.log(jnp.clip(gmm.pi, 1e-37, None))
    comp = jax.random.categorical(k_cat, logits, shape=sample_shape + batch_shape)
    # gather chosen component's mu/sigma
    onehot = jax.nn.one_hot(comp, kk, dtype=gmm.mu.dtype)  # (..., K)
    mu = jnp.einsum("...k,...kd->...d", onehot, jnp.broadcast_to(gmm.mu, sample_shape + batch_shape + (kk, d)))
    sigma = jnp.einsum("...k,...kd->...d", onehot, jnp.broadcast_to(gmm.sigma, sample_shape + batch_shape + (kk, d)))
    eps = jax.random.normal(k_norm, mu.shape, dtype=mu.dtype)
    return mu + sigma * eps


def mean(gmm: DiagGMM) -> jnp.ndarray:
    """Mixture mean: sum_k pi_k mu_k -> (..., D)."""
    return jnp.einsum("...k,...kd->...d", gmm.pi, gmm.mu)
