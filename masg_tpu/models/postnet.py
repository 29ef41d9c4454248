"""Mel PostNet: 5x Conv1d(512, k=5) + BatchNorm + tanh residual refiner.

Reference: transformer/Layers.py:67-137. The residual add is done by the
caller (fastspeech2.py:111), matching the reference. Dropout 0.5 is applied to
every conv output, including the last (Layers.py:129-137).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's exact running-statistics semantics.

    flax nn.BatchNorm folds the BIASED batch variance into the running
    average; torch.nn.BatchNorm1d normalizes with the biased variance but
    accumulates the UNBIASED one (x n/(n-1), torch/nn/functional batch_norm).
    Train-mode outputs are identical either way, but the running stats feed
    EVAL-mode normalization, so a model trained here and exported to the
    reference (or vice versa) needs the torch update rule for its inference
    outputs to match. Variable names/collection match flax BatchNorm, so
    existing checkpoints load unchanged.

    `momentum` follows the flax keep-rate convention (0.9 == torch 0.1)."""

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)

        if self.use_running_average:
            mean = ra_mean.value
            var = ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            n = 1
            for a in axes:
                n *= x.shape[a]
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            mean = xf.mean(axis=axes)
            var = ((xf - mean) ** 2).mean(axis=axes)  # biased: normalization
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                # torch accumulates the unbiased estimator
                ra_var.value = m * ra_var.value + (1 - m) * var * (
                    n / max(n - 1, 1))

        y = (x - mean.astype(x.dtype)) / jnp.sqrt(var + self.epsilon).astype(
            x.dtype)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class PostNet(nn.Module):
    n_mel_channels: int = 80
    embedding_dim: int = 512
    kernel_size: int = 5
    n_convolutions: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # x: (B, T, n_mels); channel-last convs (TPU-native layout)
        for i in range(self.n_convolutions):
            is_last = i == self.n_convolutions - 1
            out_ch = self.n_mel_channels if is_last else self.embedding_dim
            x = nn.Conv(
                out_ch, (self.kernel_size,), padding="SAME", dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = TorchBatchNorm(
                use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bn_{i}",
            )(x)
            if not is_last:
                x = jnp.tanh(x)
            x = nn.Dropout(0.5)(x, deterministic=deterministic)
        return x
