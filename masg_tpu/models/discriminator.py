"""Alternative LSTM language classifier over mels.

Reference: model/discriminator.py:7-29 — LSTM(n_mels -> hidden) + Linear +
softmax over languages. Exported for parity; the train loops use the GE2E
SpeechEmbedder instead (as in the reference).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class LangDiscriminator(nn.Module):
    n_mels: int = 80
    hidden: int = 256
    n_languages: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mels: jnp.ndarray) -> jnp.ndarray:
        """(B, T, n_mels) -> (B, n_languages) softmax probabilities."""
        x = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                   name="lstm")(mels.astype(self.dtype))
        logits = nn.Dense(self.n_languages, dtype=self.dtype, name="linear")(x[:, -1])
        return nn.softmax(logits, axis=-1)
