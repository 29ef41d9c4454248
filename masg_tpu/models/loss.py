"""Losses: FastSpeech2 masked reconstruction + TacoSpawn speaker-prior NLL.

Reference: model/loss.py:5-105. The reference uses masked_select + mean; the
static-shape equivalent is a mask-weighted mean (sum(x * mask) / sum(mask)),
numerically identical for the same mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import gmm as gmm_ops
from ..ops.gmm import DiagGMM
from .fastspeech2 import FS2Output


class FS2Losses(NamedTuple):
    total: jnp.ndarray
    mel: jnp.ndarray
    postnet_mel: jnp.ndarray
    pitch: jnp.ndarray
    energy: jnp.ndarray
    duration: jnp.ndarray


def _masked_mean(err: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Mean of err over True positions of valid.

    `valid` has the leading dims of err; each valid position covers all of
    err's trailing dims (e.g. the mel-channel axis), matching masked_select +
    mean in the reference.
    """
    per_pos = 1
    for s in err.shape[valid.ndim:]:
        per_pos *= s
    validf = valid.astype(err.dtype)
    vb = validf
    while vb.ndim < err.ndim:
        vb = vb[..., None]
    total = jnp.sum(err * vb)
    count = jnp.sum(validf) * per_pos
    return total / jnp.maximum(count, 1.0)


def fastspeech2_loss(
    output: FS2Output,
    mel_targets: jnp.ndarray,  # (B, T, n_mels)
    pitch_targets: jnp.ndarray,
    energy_targets: jnp.ndarray,
    duration_targets: jnp.ndarray,
    pitch_feature_level: str = "phoneme_level",
    energy_feature_level: str = "phoneme_level",
) -> FS2Losses:
    """Masked L1 on mels, masked MSE on pitch/energy/log-duration
    (reference loss.py:19-92)."""
    src_valid = ~output.src_pad_mask
    mel_valid = ~output.mel_pad_mask
    t = output.mel_pad_mask.shape[1]
    mel_targets = mel_targets[:, :t, :]

    # the reference computes the log target in f32 ALWAYS — `.float()` in
    # model/loss.py:42 casts to float32 even when the model runs in double.
    # Under x64 (the torch-trajectory parity tests) compute the log in f64
    # and round to f32: that is bit-identical to torch's correctly-rounded
    # f32 log, whereas XLA's fast f32 log is off by up to ~500 ulps — enough
    # to flip near-zero Adam gradients and break f64 trajectory equality.
    log_dtype = jnp.promote_types(
        output.log_duration_prediction.dtype, jnp.float32)
    if jnp.result_type(float) == jnp.float64:  # x64 mode
        log_d_targets = jnp.log(
            duration_targets.astype(jnp.float64) + 1.0
        ).astype(jnp.float32).astype(log_dtype)
    else:  # normal training: plain f32 target, a ulp-level log error is moot
        log_d_targets = jnp.log(duration_targets.astype(log_dtype) + 1.0)
    log_d_targets = jax.lax.stop_gradient(log_d_targets)

    pv = src_valid if pitch_feature_level == "phoneme_level" else mel_valid
    ev = src_valid if energy_feature_level == "phoneme_level" else mel_valid

    pitch_loss = _masked_mean((output.pitch_prediction - pitch_targets) ** 2, pv)
    energy_loss = _masked_mean((output.energy_prediction - energy_targets) ** 2, ev)
    duration_loss = _masked_mean(
        (output.log_duration_prediction - log_d_targets) ** 2, src_valid
    )
    mel_loss = _masked_mean(jnp.abs(output.mel - mel_targets), mel_valid)
    postnet_mel_loss = _masked_mean(jnp.abs(output.postnet_mel - mel_targets), mel_valid)

    total = mel_loss + postnet_mel_loss + duration_loss + pitch_loss + energy_loss
    return FS2Losses(
        total=total,
        mel=mel_loss,
        postnet_mel=postnet_mel_loss,
        pitch=pitch_loss,
        energy=energy_loss,
        duration=duration_loss,
    )


def speaker_prior_log_prob(speaker_emb: jnp.ndarray, gmm: DiagGMM) -> jnp.ndarray:
    """mean_b GMM_b.log_prob(stop_grad(speaker_emb_b)).

    Reference SpeakerMetaEncLoss (loss.py:94-105): the embedding is detached
    so the prior chases the table, not vice versa; the train loop NEGATES this
    value before backward (train.py:163-166), i.e. the loss contribution is
    -speaker_prior_log_prob.
    """
    emb = jax.lax.stop_gradient(speaker_emb)
    return jnp.mean(gmm_ops.log_prob(gmm, emb))
