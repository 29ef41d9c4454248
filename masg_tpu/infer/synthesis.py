"""Shared synthesis helpers for the inference CLIs.

Reference: synthesize.py:104-131 (forward + synth_samples), utils/tools.py
:228-274 (per-utterance figure + wav writing), utils/model.py:11-34
(get_model ckpt restore).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import CheckpointManager
from ..core.config import ExperimentConfig
from ..models import FastSpeech2
from ..ops.length_regulator import expand_scalars
from ..train.optim import make_optimizer
from ..train.state import create_train_state
from ..utils.logging import plot_mel
from .vocoder import Vocoder, vocoder_infer


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def load_model(
    cfg: ExperimentConfig,
    restore_step: int = 0,
    dtype=jnp.float32,
) -> tuple:
    """Build FastSpeech2 and restore weights from the experiment's ckpt dir
    (reference get_model(train=False), utils/model.py:11-34)."""
    model = FastSpeech2.from_config(cfg, dtype=dtype)
    L, T = 16, 64
    init_rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    init_kwargs = dict(
        accents=jnp.zeros((1, L), jnp.int32),
        speaker_meta=jnp.zeros((1, cfg.preprocess.speaker_generation.one_hot_dim)),
    )
    if cfg.model.jdit.use_jdit:
        # the teacher branch needs mels (+ the rest of the teacher-forced
        # inputs) at init so its params exist for checkpoint restore;
        # pitch/energy target lengths follow their feature level
        p_len = L if cfg.preprocess.pitch.feature == "phoneme_level" else T
        e_len = L if cfg.preprocess.energy.feature == "phoneme_level" else T
        init_kwargs.update(
            mels=jnp.zeros((1, T, cfg.preprocess.mel.n_mel_channels)),
            mel_lens=jnp.asarray([T], jnp.int32),
            p_targets=jnp.zeros((1, p_len)), e_targets=jnp.zeros((1, e_len)),
            d_targets=jnp.full((1, L), T // L, jnp.int32),
        )
    variables = model.init(
        init_rngs,
        jnp.zeros(1, jnp.int32), jnp.zeros((1, L), jnp.int32),
        jnp.asarray([L], jnp.int32), T,
        **init_kwargs,
    )
    if restore_step:
        tx = make_optimizer(cfg.train.optimizer, cfg.model.transformer.encoder_hidden)
        state = create_train_state(model, variables, tx)
        mgr = CheckpointManager(cfg.train.path.ckpt_path)
        state = mgr.restore_model_only(restore_step, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    return model, variables


def synthesize_batch(
    model: FastSpeech2,
    variables,
    batch: Dict[str, np.ndarray],
    p_control: float = 1.0,
    e_control: float = 1.0,
    d_control: float = 1.0,
    max_mel_len: int = 1000,
    speaker_emb: Optional[np.ndarray] = None,
):
    """Free-running forward. batch: texts/src_lens/accents + speakers
    + speaker_meta (or an explicit speaker_emb matrix)."""
    texts = jnp.asarray(batch["texts"])
    src_lens = jnp.asarray(batch["src_lens"])
    accents = jnp.asarray(batch["accents"]) if batch.get("accents") is not None else None
    if speaker_emb is not None:
        return model.apply(
            variables, texts, src_lens, max_mel_len, jnp.asarray(speaker_emb),
            p_control=p_control, e_control=e_control, d_control=d_control,
            accents=accents, method=FastSpeech2.synthesize_from_speaker_emb,
        )
    return model.apply(
        variables,
        jnp.asarray(batch["speakers"]), texts, src_lens, max_mel_len,
        p_control=p_control, e_control=e_control, d_control=d_control,
        accents=accents, speaker_meta=jnp.asarray(batch["speaker_meta"]),
    )


def pause_phone_ids():
    """Ids of silence/pause symbols (@sp/@spn/@sil + bare 'sp')."""
    from ..text.symbols import symbols

    return frozenset(
        i for i, s in enumerate(symbols)
        if s in ("@sp", "@spn", "@sil", "sp", "sil", "pau")
    )


def chunk_phone_ids(
    ids,
    accent_ids=None,
    max_phones: int = 120,
    pause_ids: Optional[frozenset] = None,
):
    """Split a long phone sequence into synthesis chunks.

    Prefers splitting right AFTER a pause phone (natural silence, so the
    stitched audio has no mid-word seams); hard-splits at `max_phones` when
    no pause occurs. Concatenating the chunks reproduces the input exactly.
    Returns a list of (ids_chunk, accents_chunk-or-None).
    """
    ids = list(ids)
    acc = list(accent_ids) if accent_ids is not None else None
    if pause_ids is None:
        pause_ids = pause_phone_ids()
    chunks = []
    start = 0
    last_pause = -1
    for i, pid in enumerate(ids):
        if pid in pause_ids:
            last_pause = i
        if i - start + 1 >= max_phones:
            end = last_pause + 1 if last_pause >= start else i + 1
            chunks.append(
                (ids[start:end], acc[start:end] if acc is not None else None))
            start = end
            last_pause = -1
    if start < len(ids):
        chunks.append((ids[start:], acc[start:] if acc is not None else None))
    return chunks


def synthesize_long(
    model: FastSpeech2,
    variables,
    ids,
    accent_ids=None,
    speaker_id: int = 0,
    speaker_meta: Optional[np.ndarray] = None,
    speaker_emb: Optional[np.ndarray] = None,
    p_control: float = 1.0,
    e_control: float = 1.0,
    d_control: float = 1.0,
    max_phones: int = 120,
    max_mel_len: int = 1000,
    vocoder: Optional[Vocoder] = None,
    meta_dim: int = 4,
):
    """Unbounded-length synthesis (beyond reference parity: the reference
    decoder truncates everything past max_seq_len=1000 frames ≈ 11.6 s,
    transformer/Models.py:166-174).

    The text splits into chunks at pause phones (chunk_phone_ids), ALL
    chunks synthesize in ONE batched free-running dispatch (B = n_chunks),
    and the per-chunk mels stitch back in order; the vocoder then runs once
    over the stitched mel. Returns {"mel", "mel_len", "n_chunks"[, "wav"]}.
    """
    chunks = chunk_phone_ids(ids, accent_ids, max_phones=max_phones)
    if not chunks:
        raise ValueError("empty phone sequence")
    from ..text import NO_ACCENT_ID

    B = len(chunks)
    L = max(len(c) for c, _ in chunks)
    texts = np.zeros((B, L), np.int32)
    acc = np.zeros((B, L), np.int32)
    src_lens = np.zeros(B, np.int32)
    for i, (c, a) in enumerate(chunks):
        texts[i, :len(c)] = c
        if a is not None:
            m = min(len(a), len(c))
            acc[i, :m] = a[:m]
            acc[i, m:len(c)] = NO_ACCENT_ID  # short accents -> no-accent
        else:
            acc[i, :len(c)] = NO_ACCENT_ID
        src_lens[i] = len(c)

    batch = {
        "texts": texts, "src_lens": src_lens, "accents": acc,
        "speakers": np.full(B, speaker_id, np.int32),
        "speaker_meta": (
            np.tile(np.asarray(speaker_meta, np.float32).reshape(1, -1), (B, 1))
            if speaker_meta is not None else np.zeros((B, meta_dim), np.float32)
        ),
    }
    emb = (np.tile(np.asarray(speaker_emb, np.float32).reshape(1, -1), (B, 1))
           if speaker_emb is not None else None)
    out = synthesize_batch(
        model, variables, batch, p_control, e_control, d_control,
        max_mel_len=max_mel_len, speaker_emb=emb,
    )
    mel_lens = np.asarray(out.mel_len)
    mels = np.asarray(out.postnet_mel, np.float32)
    stitched = np.concatenate([mels[i, :int(mel_lens[i])] for i in range(B)], 0)

    result = {"mel": stitched, "mel_len": int(stitched.shape[0]), "n_chunks": B}
    if vocoder is not None and stitched.shape[0] > 0:
        wavs = vocoder_infer(
            jnp.asarray(stitched[None]), vocoder,
            lengths=np.asarray([stitched.shape[0] * vocoder.hop_length]),
        )
        result["wav"] = wavs[0]
    return result


def save_synth_results(
    cfg: ExperimentConfig,
    batch: Dict[str, np.ndarray],
    output,
    vocoder: Optional[Vocoder],
    result_path: str,
    write_figures: bool = True,
) -> List[str]:
    """Per-utterance png + wav (reference synth_samples, utils/tools.py:228-274)."""
    from ..audio.wavio import write_wav

    os.makedirs(result_path, exist_ok=True)
    written = []
    mel_lens = np.asarray(output.mel_len)
    postnet_mel = np.asarray(output.postnet_mel)
    hop = cfg.preprocess.stft.hop_length
    sr = cfg.preprocess.audio.sampling_rate

    if write_figures and cfg.stats is not None:
        stats = list(cfg.stats.pitch) + list(cfg.stats.energy[:2])
        durations = np.asarray(output.duration_rounded)
        pitches = np.asarray(output.pitch_prediction)
        energies = np.asarray(output.energy_prediction)
        t_max = postnet_mel.shape[1]
        for i, basename in enumerate(batch["ids"]):
            mel_len = int(mel_lens[i])
            src_len = int(batch["src_lens"][i])
            mel = postnet_mel[i, :mel_len].T
            if cfg.preprocess.pitch.feature == "phoneme_level":
                pitch = np.asarray(
                    expand_scalars(
                        jnp.asarray(pitches[i:i+1, :src_len]),
                        jnp.asarray(durations[i:i+1, :src_len].astype(np.int32)),
                        t_max,
                    )
                )[0][:mel_len]
            else:
                pitch = pitches[i, :mel_len]
            if cfg.preprocess.energy.feature == "phoneme_level":
                energy = np.asarray(
                    expand_scalars(
                        jnp.asarray(energies[i:i+1, :src_len]),
                        jnp.asarray(durations[i:i+1, :src_len].astype(np.int32)),
                        t_max,
                    )
                )[0][:mel_len]
            else:
                energy = energies[i, :mel_len]
            fig = plot_mel([(mel, pitch, energy)], stats, ["Synthetized Spectrogram"])
            import matplotlib.pyplot as plt

            fig.savefig(os.path.join(result_path, f"{basename}.png"))
            plt.close(fig)

    if vocoder is not None:
        lengths = mel_lens * hop
        wavs = vocoder_infer(jnp.asarray(postnet_mel), vocoder, lengths)
        for wav, basename in zip(wavs, batch["ids"]):
            p = os.path.join(result_path, f"{basename}.wav")
            write_wav(p, wav, sr)
            written.append(p)
    return written
