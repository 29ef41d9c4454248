"""GE2E multilingual speaker encoder with domain adaptation (language head).

Used two ways, as in the reference:
  1. standalone speaker-verification training (GE2E softmax loss over N x M
     language-balanced batches);
  2. frozen (or jointly trained, `ganlike`) language discriminator inside the
     TTS loop: predicted mels are chunked into 150-frame windows and scored.

Reference: Multilingual-Speaker-Encoder-with-Domain-Adaptation/
speech_embedder_net.py:65-187, utils.py:16-135. TPU notes: the 3-layer LSTM is
a lax.scan over 150 static steps (sequence length fixed by tisv_frame); the
GE2E similarity is one (N,M,Dim)x(N,Dim) einsum — no python loops.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class SpeechEmbedder(nn.Module):
    """3-layer LSTM(n_mels -> hidden), last frame -> Dense(proj), L2-normalize.

    Reference speech_embedder_net.py:65-140 (LSTM architecture path; config
    hidden=256, num_layer=3, proj=64).
    """

    n_mels: int = 80
    hidden: int = 256
    n_layers: int = 3
    proj: int = 64
    use_da: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, mels: jnp.ndarray, detach: bool = False, deterministic: bool = True
    ):
        """mels: (B, T, n_mels) fixed-T chunks -> dict with 'embeddings'
        (B, proj) and optionally 'da_lang_logits' (B,)."""
        x = mels.astype(self.dtype)
        for i in range(self.n_layers):
            rnn = nn.RNN(
                # param_dtype also fixes the scan CARRY dtype — without it
                # the zero carry inits f32 and the scan body rejects f64
                # hidden states under the x64 parity tests
                nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype,
                                     param_dtype=self.dtype),
                name=f"lstm_{i}",
            )
            x = rnn(x)
        last = x[:, -1]  # only use last frame (speech_embedder_net.py:109-111)
        emb = nn.Dense(self.proj, dtype=self.dtype, name="projection")(last)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

        out = {"embeddings": emb}
        if self.use_da:
            e = jax.lax.stop_gradient(emb) if detach else emb
            # MLP 64 -> 64 -> 64 -> 1 with dropout 0.2 (module.py MultiLayerNN;
            # GradReverse is defined but bypassed in the reference — DA trains
            # via the loss-sign schedule instead)
            h = e
            for j in range(2):
                h = nn.Dense(self.proj, dtype=self.dtype, name=f"da_linear_{j}")(h)
                h = nn.Dropout(0.2)(h, deterministic=deterministic)
                h = nn.relu(h)
            logits = nn.Dense(1, dtype=self.dtype, name="da_linear_out")(h)[..., 0]
            out["da_lang_logits"] = logits
        return out


# ---------------------------------------------------------------------------
# GE2E similarity + losses (pure functions; reference utils.py:16-135)
# ---------------------------------------------------------------------------


def ge2e_similarity(embeddings: jnp.ndarray) -> jnp.ndarray:
    """(N, M, D) -> (N, M, N) cosine similarity to speaker centroids.

    For j == k the centroid excludes the utterance itself
    (utils.py:27-37,57-75).
    """
    n, m, d = embeddings.shape
    centroids = jnp.mean(embeddings, axis=1)  # (N, D) include-self
    excl = (jnp.sum(embeddings, axis=1, keepdims=True) - embeddings) / (m - 1)  # (N, M, D)

    def cos(a, b):
        num = jnp.sum(a * b, axis=-1)
        return num / (jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-12)

    sim = cos(embeddings[:, :, None, :], centroids[None, None, :, :])  # (N, M, N)
    sim_self = cos(embeddings, excl)  # (N, M)
    eye = jnp.eye(n, dtype=bool)[:, None, :]  # (N, 1, N)
    return jnp.where(eye, sim_self[:, :, None], sim)


def ge2e_softmax_loss(similarity: jnp.ndarray) -> jnp.ndarray:
    """sum_ji[ log(sum_k exp(S_jik) + 1e-6) - S_jij ] (utils.py:126-135)."""
    n = similarity.shape[0]
    lse = jnp.log(jnp.sum(jnp.exp(similarity), axis=2) + 1e-6)  # (N, M)
    own = similarity[jnp.arange(n), :, jnp.arange(n)]  # (N, M)
    return jnp.sum(lse) - jnp.sum(own)


def ge2e_contrast_loss(similarity: jnp.ndarray) -> jnp.ndarray:
    """sum_ji[ 1 - sigmoid(S_jij) + max_{k != j} sigmoid(S_jik) ]
    (utils.py:106-124)."""
    n = similarity.shape[0]
    sig = jax.nn.sigmoid(similarity)
    own = sig[jnp.arange(n), :, jnp.arange(n)]
    eye = jnp.eye(n, dtype=bool)[:, None, :]
    others = jnp.where(eye, 0.0, sig)
    return jnp.sum(1.0 - own) + jnp.sum(jnp.max(others, axis=2))


class GE2ELossParams(NamedTuple):
    """Learned affine on the similarity matrix (w=10, b=-5 init,
    speech_embedder_net.py:165-166)."""

    w: jnp.ndarray
    b: jnp.ndarray


def init_ge2e_params() -> GE2ELossParams:
    return GE2ELossParams(w=jnp.asarray(10.0), b=jnp.asarray(-5.0))


def bce_with_logits_sum(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """nn.BCEWithLogitsLoss(reduction='sum') equivalent."""
    return jnp.sum(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def ge2e_loss(
    params: GE2ELossParams,
    embeddings: jnp.ndarray,  # (N, M, D)
    lang_logits: Optional[jnp.ndarray],  # (N*M,) or None
    langs: Optional[jnp.ndarray],  # (N*M,) float {0,1}
    loss_type: str = "softmax",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(total, ge2e_part, da_part) — reference speech_embedder_net.py:173-187."""
    w = jnp.clip(params.w, 1e-6, None)
    sim = w * ge2e_similarity(embeddings) + params.b
    if loss_type == "contrast":
        loss = ge2e_contrast_loss(sim)
    else:
        loss = ge2e_softmax_loss(sim)
    if lang_logits is not None:
        da = bce_with_logits_sum(lang_logits, langs)
    else:
        da = jnp.asarray(0.0)
    return loss + da, loss, da


def chunk_mels(mel: jnp.ndarray, chunk: int = 150) -> jnp.ndarray:
    """(B, T, n_mels) -> (B * ceil(T/chunk), chunk, n_mels), zero-padded.

    Matches the TTS loop's discriminator reshaping (reference train.py:181-184,
    ganlike.py:39-44).
    """
    b, t, n = mel.shape
    n_chunks = t // chunk + 1  # reference: max_len // 150 + 1 (always pads)
    pad = n_chunks * chunk - t
    mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)))
    return mel.reshape(b * n_chunks, chunk, n)
