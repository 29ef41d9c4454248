"""Mel PostNet: 5x Conv1d(512, k=5) + BatchNorm + tanh residual refiner.

Reference: transformer/Layers.py:67-137. The residual add is done by the
caller (fastspeech2.py:111), matching the reference. Dropout 0.5 is applied to
every conv output, including the last (Layers.py:129-137).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


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
            x = nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bn_{i}",
            )(x)
            if not is_last:
                x = jnp.tanh(x)
            x = nn.Dropout(0.5)(x, deterministic=deterministic)
        return x
