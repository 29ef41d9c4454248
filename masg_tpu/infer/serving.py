"""Production serving engine: bucketed, pre-compiled text->wav synthesis.

The reference has no serving story — inference is one-shot CLI scripts that
pay model construction + compile on every invocation (synthesize.py:104-131).
A TPU service cannot do that: XLA compiles one graph per input shape, so an
engine must (a) pad requests onto a small ladder of static (L_text, T_mel)
buckets and (b) compile every bucket up front, leaving only pure dispatch on
the request path. Each bucket's graph fuses the full pipeline — FastSpeech2
free-running forward (predicted durations) + HiFi-GAN/MelGAN vocoding — into
ONE jitted call, so a request costs a single device dispatch.

Pitch/energy/duration controls are traced as scalar *arrays*, not Python
floats, so changing a control never recompiles.

Thread safety: JAX dispatch is thread-safe, but the engine serializes calls
with a lock so concurrent HTTP handlers queue instead of interleaving device
work (see cli/serve.py).
"""

from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ExperimentConfig
from ..models import FastSpeech2
from .synthesis import load_model, round_up
from .vocoder import Vocoder


def with_duration_bias(variables, value: float):
    """Return `variables` with the duration predictor's output bias shifted by
    `value` (log-duration space). An UNTRAINED model predicts
    round(exp(0)-1)=0 durations and free-runs to zero frames; value=ln(5)
    (~4 frames/phone after rounding) makes demos/benchmarks on fresh weights
    drive the exact trained-model graph at a realistic speech rate."""

    def set_bias(path, x):
        keys = [str(getattr(k, "key", k)) for k in path]
        if ("duration_predictor" in keys and "linear_layer" in keys
                and keys[-1] == "bias"):
            return x + np.asarray(value, x.dtype)
        return x

    return jax.tree_util.tree_map_with_path(set_bias, variables)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; raises if the request exceeds the ladder."""
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(
        f"request length {n} exceeds the largest text bucket {buckets[-1]}"
    )


class ServingEngine:
    """Pre-compiled synthesis service over one model + vocoder.

    Parameters
    ----------
    cfg: experiment config (the reference 3-file YAML dir, loaded).
    restore_step: checkpoint step to restore (0 = fresh params; mainly for
        tests, which inject `variables` instead).
    variables: optional explicit model variables (overrides restore_step).
    vocoder: a Vocoder, or None to emit raw mels only.
    text_buckets: ladder of padded phone lengths, ascending.
    frames_per_phone: mel-frame budget per phone; each text bucket L gets a
        mel cap of round_up(L * frames_per_phone, 128), clipped to
        max_seq_len (the decoder's PE/truncation limit, reference
        transformer/Models.py:166-174).
    """

    def __init__(
        self,
        cfg: ExperimentConfig,
        restore_step: int = 0,
        variables=None,
        vocoder: Optional[Vocoder] = None,
        text_buckets: Sequence[int] = (16, 32, 64, 128),
        frames_per_phone: int = 12,
        dtype=jnp.float32,
    ):
        self.cfg = cfg
        self.vocoder = vocoder
        self.text_buckets = tuple(sorted(text_buckets))
        self.hop = cfg.preprocess.stft.hop_length
        self.sample_rate = cfg.preprocess.audio.sampling_rate
        self.meta_dim = cfg.preprocess.speaker_generation.one_hot_dim
        max_seq_len = cfg.model.max_seq_len

        self.model, loaded = load_model(cfg, restore_step, dtype=dtype)
        self.variables = variables if variables is not None else loaded

        self.mel_caps: Dict[int, int] = {
            L: min(max_seq_len, round_up(L * frames_per_phone, 128))
            for L in self.text_buckets
        }
        self._fns = {L: self._build(L, self.mel_caps[L]) for L in self.text_buckets}
        self._emb_fns = {
            L: self._build(L, self.mel_caps[L], from_emb=True)
            for L in self.text_buckets
        }
        self._lock = threading.Lock()
        self.n_requests = 0

    # ------------------------------------------------------------------
    def _build(self, L: int, T: int, from_emb: bool = False):
        model, vocoder = self.model, self.vocoder

        def fn(variables, voc_params, texts, src_lens, accents, spk, meta, controls):
            p_c, e_c, d_c = controls[0], controls[1], controls[2]
            if from_emb:
                out = model.apply(
                    variables, texts, src_lens, T, spk,
                    p_control=p_c, e_control=e_c, d_control=d_c,
                    accents=accents, method=FastSpeech2.synthesize_from_speaker_emb,
                )
            else:
                out = model.apply(
                    variables, spk, texts, src_lens, T,
                    p_control=p_c, e_control=e_c, d_control=d_c,
                    accents=accents, speaker_meta=meta,
                )
            if vocoder is None:
                return out.postnet_mel, out.mel_len
            wav = vocoder.generator.apply(
                {"params": voc_params}, out.postnet_mel * vocoder.mel_scale
            )
            return wav, out.mel_len

        return jax.jit(fn)

    def warmup(self, include_speaker_emb: bool = False) -> Dict[int, float]:
        """Compile every bucket; returns per-bucket compile seconds."""
        times: Dict[int, float] = {}
        for L in self.text_buckets:
            t0 = time.perf_counter()
            self._run(
                np.ones((1, L), np.int32), np.asarray([L], np.int32),
                np.zeros((1, L), np.int32), speaker_id=0,
            )
            if include_speaker_emb:
                emb_dim = self.cfg.model.transformer.encoder_hidden
                self._run(
                    np.ones((1, L), np.int32), np.asarray([L], np.int32),
                    np.zeros((1, L), np.int32),
                    speaker_emb=np.zeros((1, emb_dim), np.float32),
                )
            times[L] = time.perf_counter() - t0
        return times

    # ------------------------------------------------------------------
    def _run(
        self,
        texts: np.ndarray,
        src_lens: np.ndarray,
        accents: np.ndarray,
        speaker_id: int = 0,
        speaker_meta: Optional[np.ndarray] = None,
        speaker_emb: Optional[np.ndarray] = None,
        controls: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    ):
        L = texts.shape[1]
        voc_params = self.vocoder.params if self.vocoder is not None else {}
        c = jnp.asarray(controls, jnp.float32)
        if speaker_emb is not None:
            fn = self._emb_fns[L]
            spk = jnp.asarray(speaker_emb, jnp.float32)
            meta = jnp.zeros((texts.shape[0], self.meta_dim), jnp.float32)
        else:
            fn = self._fns[L]
            spk = jnp.asarray([speaker_id] * texts.shape[0], jnp.int32)
            meta = (
                jnp.asarray(speaker_meta, jnp.float32)
                if speaker_meta is not None
                else jnp.zeros((texts.shape[0], self.meta_dim), jnp.float32)
            )
        return fn(
            self.variables, voc_params, jnp.asarray(texts), jnp.asarray(src_lens),
            jnp.asarray(accents), spk, meta, c,
        )

    # ------------------------------------------------------------------
    def synthesize(
        self,
        ids: Sequence[int],
        accent_ids: Optional[Sequence[int]] = None,
        speaker_id: int = 0,
        speaker_meta: Optional[np.ndarray] = None,
        speaker_emb: Optional[np.ndarray] = None,
        pitch_control: float = 1.0,
        energy_control: float = 1.0,
        duration_control: float = 1.0,
    ) -> Dict[str, object]:
        """One utterance -> int16 wav (or mel when built without a vocoder).

        Returns {"wav" or "mel", "mel_len", "sample_rate", "latency_s",
        "bucket"}. Pads onto the smallest fitting text bucket and truncates
        the output to mel_len frames (* hop samples).
        """
        from ..text import NO_ACCENT_ID

        n = len(ids)
        if n == 0:
            raise ValueError("empty phone sequence")
        L = pick_bucket(n, self.text_buckets)
        texts = np.zeros((1, L), np.int32)
        texts[0, :n] = np.asarray(ids, np.int32)
        acc = np.zeros((1, L), np.int32)
        if accent_ids is not None:
            m = min(len(accent_ids), n)
            acc[0, :m] = np.asarray(accent_ids[:m], np.int32)
        else:
            acc[0, :n] = NO_ACCENT_ID
        src_lens = np.asarray([n], np.int32)

        t0 = time.perf_counter()
        with self._lock:
            out, mel_len = self._run(
                texts, src_lens, acc, speaker_id, speaker_meta, speaker_emb,
                (pitch_control, energy_control, duration_control),
            )
            mel_len = int(np.asarray(mel_len)[0])
            out = np.asarray(out[0], np.float32)
            self.n_requests += 1  # guarded: int += is not atomic across threads
        latency = time.perf_counter() - t0

        result = {
            "mel_len": mel_len,
            "sample_rate": self.sample_rate,
            "latency_s": latency,
            "bucket": L,
        }
        if self.vocoder is None:
            result["mel"] = out[:mel_len]
        else:
            wav = (out[: mel_len * self.hop] * self.vocoder.max_wav_value)
            result["wav"] = np.clip(wav, -32768, 32767).astype(np.int16)
        return result
