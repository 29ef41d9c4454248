"""Standalone GE2E speaker-encoder training.

Reference: Multilingual-.../train_speech_embedder.py:115-248. N language-
balanced speakers x M chunk utterances per batch; GE2E softmax loss on the
(N, M, N) similarity + binary language DA loss; per-group update semantics
(main/ge2e clip 3.0/1.0; DA head clipped 3.0, stepped only while da_loss is
under its threshold or during DA pretrain).

Faithfulness note: the shipped reference snapshot has the GE2E backward
commented out (train_speech_embedder.py:184 — its config is the
'sg_discriminator_woGE2E' ablation); `use_ge2e_backward=False` reproduces
that ablation, True trains the full method.
"""

from __future__ import annotations

import math
import os
import random
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.speaker_encoder import (
    GE2ELossParams,
    SpeechEmbedder,
    ge2e_loss,
    init_ge2e_params,
)


class SpeakerChunkDataset:
    """`{dataset}_{spkr}_{gender}_{lang}.npy` chunk archives -> language-
    balanced N x M sampling (reference data_load.py:44-136)."""

    def __init__(self, path: str, datasets: List[str], m_utts: int = 10,
                 tisv_frame: int = 150, seed: int = 0):
        import glob as g

        self.path = path
        self.m = m_utts
        self.tisv_frame = tisv_frame
        self.rng = random.Random(seed)
        self.files = []
        for d in datasets:
            self.files += sorted(
                os.path.basename(p) for p in g.glob(os.path.join(path, f"{d.lower()}*.npy"))
            )
        self.lang2files: Dict[str, List[str]] = {}
        for f in self.files:
            lang = self.decode(f)["language"]
            self.lang2files.setdefault(lang, []).append(f)
        self.langs = sorted(self.lang2files)
        if not self.files:
            raise FileNotFoundError(
                f"no chunk archives matching {[d.lower() + '*.npy' for d in datasets]} "
                f"under {path} — run the GE2E preprocessing first "
                f"(masg_tpu.preprocessor.ge2e_preprocess; note chunks need "
                f">= tisv_frame*hop samples of voiced audio per VAD span)"
            )
        self.data = {f: np.load(os.path.join(path, f)) for f in self.files}

    @staticmethod
    def decode(filename: str) -> Dict[str, str]:
        d, s, g, l = os.path.basename(filename)[:-4].split("_")
        return {"dataset": d, "spkr": s, "gender": g, "language": l}

    def __len__(self):
        return len(self.files)

    def sample_batch(self, n_speakers: int, variable_length: bool = True,
                     hop: int = 256, sr: int = 22050) -> Tuple[np.ndarray, np.ndarray]:
        """(N*M, T, n_mels) mel chunks + (N*M,) float language labels.
        Language-balanced by idx % n_langs; random crop to a shared variable
        length (reference Collate, data_load.py:114-136)."""
        mels, langs = [], []
        t = self.tisv_frame
        if variable_length:
            lower = int(self.tisv_frame - 0.4 / (hop / sr))
            lower = max(1, min(lower, self.tisv_frame))
            t = self.rng.randint(lower, self.tisv_frame)
        for i in range(n_speakers):
            lang_idx = i % len(self.langs)
            f = self.rng.choice(self.lang2files[self.langs[lang_idx]])
            utters = self.data[f]  # (n_chunks, n_mels, frames)
            idxs = list(range(utters.shape[0]))
            chosen = (
                self.rng.choices(idxs, k=self.m)
                if self.m > len(idxs)
                else self.rng.sample(idxs, self.m)
            )
            sel = utters[chosen][:, :, : self.tisv_frame]
            p = self.rng.randint(0, self.tisv_frame - t)
            sel = sel[:, :, p : p + t]
            mels.append(np.transpose(sel, (0, 2, 1)))  # (M, T, n_mels)
            langs += [float(lang_idx)] * self.m
        return np.concatenate(mels, 0), np.array(langs, np.float32)


class GE2ETrainState(NamedTuple):
    embedder_params: dict
    ge2e: GE2ELossParams
    opt_state_main: optax.OptState
    opt_state_ge2e: optax.OptState
    opt_state_da: optax.OptState


def _split_da(params: dict) -> Tuple[dict, dict]:
    main = {k: v for k, v in params.items() if not k.startswith("da_")}
    da = {k: v for k, v in params.items() if k.startswith("da_")}
    return main, da


def make_ge2e_train_step(
    embedder: SpeechEmbedder,
    n_speakers: int,
    m_utts: int,
    lr: float = 1e-3,
    use_ge2e_backward: bool = True,
    da_coef_fn=None,
):
    """Jitted GE2E step with the reference's per-group optimizers:
    main (Adam lr, wd 1e-6, clip 3.0), ge2e w/b (Adam lr, clip 1.0),
    DA head (Adam 1e-3, wd 1e-6, clip 3.0, gated by da_gate)."""
    tx_main = optax.chain(optax.clip_by_global_norm(3.0),
                          optax.adamw(lr, weight_decay=1e-6))
    tx_ge2e = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    tx_da = optax.chain(optax.clip_by_global_norm(3.0),
                        optax.adamw(1e-3, weight_decay=1e-6))

    def init_state(rng, sample_mels) -> GE2ETrainState:
        params = embedder.init(rng, jnp.asarray(sample_mels))["params"]
        main, da = _split_da(params)
        ge2e = init_ge2e_params()
        return GE2ETrainState(
            embedder_params=params,
            ge2e=ge2e,
            opt_state_main=tx_main.init(main),
            opt_state_ge2e=tx_ge2e.init(ge2e),
            opt_state_da=tx_da.init(da),
        )

    def loss_fn(params, ge2e_params, mels, langs, rng):
        out = embedder.apply({"params": params}, mels, deterministic=False,
                             rngs={"dropout": rng})
        emb = out["embeddings"].reshape(n_speakers, m_utts, -1)
        total, loss, da = ge2e_loss(ge2e_params, emb, out.get("da_lang_logits"), langs)
        objective = (loss if use_ge2e_backward else 0.0) + da
        return objective, (loss, da)

    @jax.jit
    def step(state: GE2ETrainState, mels, langs, rng, da_gate):
        (_, (loss, da)), grads = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                                    has_aux=True)(
            state.embedder_params, state.ge2e, mels, langs, rng
        )
        gp, gg = grads
        g_main, g_da = _split_da(gp)
        p_main, p_da = _split_da(state.embedder_params)

        upd_m, os_main = tx_main.update(g_main, state.opt_state_main, p_main)
        p_main = optax.apply_updates(p_main, upd_m)
        upd_g, os_ge2e = tx_ge2e.update(gg, state.opt_state_ge2e, state.ge2e)
        ge2e_new = optax.apply_updates(state.ge2e, upd_g)

        def do_da(args):
            p_da, os_da = args
            upd_d, os_da2 = tx_da.update(g_da, os_da, p_da)
            return optax.apply_updates(p_da, upd_d), os_da2

        p_da, os_da = jax.lax.cond(
            da_gate, do_da, lambda a: a, (p_da, state.opt_state_da)
        )
        params = {**p_main, **p_da}
        return (
            GE2ETrainState(params, ge2e_new, os_main, os_ge2e, os_da),
            loss,
            da,
        )

    return init_state, step


def compute_da_threshold(n: int, m: int, n_labels: int = 1) -> float:
    """Reference utils.py:260-264."""
    if n_labels == 1:
        n_labels = 2
    return -math.log(1.0 / n_labels) * n * m


def make_da_subroutine_step(embedder: SpeechEmbedder):
    """DA-classifier-only retraining step (embeddings detached): reference
    da_classifier_subroutine (train_speech_embedder.py:250-290), run each
    epoch to keep the language head converged."""
    from ..models.speaker_encoder import bce_with_logits_sum

    tx = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(1e-3))

    def loss_fn(da_params, main_params, mels, langs):
        params = {**main_params, **da_params}
        out = embedder.apply({"params": params}, mels, detach=True,
                             deterministic=True)
        return bce_with_logits_sum(out["da_lang_logits"], langs)

    @jax.jit
    def step(da_params, opt_state, main_params, mels, langs):
        loss, grads = jax.value_and_grad(loss_fn)(da_params, main_params, mels, langs)
        upd, opt_state = tx.update(grads, opt_state, da_params)
        return optax.apply_updates(da_params, upd), opt_state, loss

    return tx, step


_DA_STEP_CACHE: dict = {}


def run_da_subroutine(embedder, state: GE2ETrainState, dataset, n_speakers: int,
                      batches: int = 8, max_epochs: int = 10,
                      verbose: bool = False) -> GE2ETrainState:
    """Retrain the DA head to convergence (stops when avg loss < 20 or stops
    improving, like the reference). The jitted step is cached per embedder so
    per-epoch calls don't retrace."""
    key = id(embedder)
    if key not in _DA_STEP_CACHE:
        _DA_STEP_CACHE[key] = make_da_subroutine_step(embedder)
    tx, step = _DA_STEP_CACHE[key]
    p_main, p_da = _split_da(state.embedder_params)
    opt_state = tx.init(p_da)
    prev = float("inf")
    for e in range(max_epochs):
        avg = 0.0
        for _ in range(batches):
            mels, langs = dataset.sample_batch(n_speakers, variable_length=False)
            p_da, opt_state, loss = step(p_da, opt_state, p_main,
                                         jnp.asarray(mels), jnp.asarray(langs))
            avg += float(loss)
        avg /= batches
        if verbose:
            print(f"Da subroutine epoch {e}, avg loss: {avg:.2f}")
        if avg < 20 or avg > prev:
            break
        prev = avg
    return state._replace(embedder_params={**p_main, **p_da})


def train_speaker_encoder(
    data_path: str,
    datasets: List[str],
    out_dir: str,
    n_speakers: int = 32,
    m_utts: int = 10,
    epochs: int = 2400,
    batches_per_epoch: Optional[int] = None,
    lr: float = 1e-3,
    da_startpoint: float = 0.0,
    use_ge2e_backward: bool = True,
    checkpoint_interval: int = 200,
    seed: int = 0,
    n_mels: int = 80,
    verbose: bool = True,
    n_devices: Optional[int] = None,
):
    """Full trainer (reference train:115-248). Returns final params + ge2e.

    Data parallelism: the reference GE2E trainer is the repo's only NCCL DDP
    user (train_speech_embedder.py:128-132). Here the (N*M, T, n_mels) chunk
    batch dp-shards over a device mesh; the GE2E similarity needs every
    embedding, so XLA inserts the all-gather before the (N, M, N) matrix —
    no hand-written collectives."""
    import orbax.checkpoint as ocp

    from ..parallel.mesh import data_parallel_size, make_mesh, replicate, shard_batch

    ds = SpeakerChunkDataset(data_path, datasets, m_utts=m_utts, seed=seed)
    n_speakers = min(n_speakers, len(ds))
    batches_per_epoch = batches_per_epoch or max(1, len(ds) // n_speakers)

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    mesh = make_mesh(
        n_data=data_parallel_size(n_speakers * m_utts, len(devices)),
        n_model=1, devices=devices,
    )

    def place(mels, langs):
        return shard_batch({"m": jnp.asarray(mels), "l": jnp.asarray(langs)}, mesh)

    embedder = SpeechEmbedder(n_mels=n_mels)
    init_state, step = make_ge2e_train_step(
        embedder, n_speakers, m_utts, lr, use_ge2e_backward
    )
    mels0, _ = ds.sample_batch(n_speakers, variable_length=False)
    rng = jax.random.PRNGKey(seed)
    state = init_state(rng, mels0)
    state = replicate(state, mesh)

    threshold = compute_da_threshold(n_speakers, m_utts)
    os.makedirs(out_dir, exist_ok=True)
    mgr = ocp.CheckpointManager(os.path.abspath(out_dir))
    da_loss_val = 0.0

    for e in range(epochs):
        progress = e / epochs
        total = total_da = 0.0
        for b in range(batches_per_epoch):
            mels, langs = ds.sample_batch(n_speakers, variable_length=False)
            placed = place(mels, langs)
            rng, sub = jax.random.split(rng)
            da_gate = (da_loss_val < threshold) or (progress <= da_startpoint)
            state, loss, da = step(state, placed["m"], placed["l"],
                                   sub, jnp.asarray(da_gate))
            da_loss_val = float(da)
            total += float(loss)
            total_da += da_loss_val
        if verbose:
            print(f"Epoch {e+1}: avg ge2e {total/batches_per_epoch:.3f} "
                  f"avg da {total_da/batches_per_epoch:.3f}")
        if progress > da_startpoint:
            # reference retrains the DA classifier each epoch (:250-290)
            state = run_da_subroutine(embedder, state, ds, n_speakers,
                                      batches=batches_per_epoch)
        if (e + 1) % checkpoint_interval == 0:
            mgr.save(e + 1, args=ocp.args.StandardSave(
                {"params": state.embedder_params,
                 "ge2e": {"w": np.asarray(state.ge2e.w), "b": np.asarray(state.ge2e.b)}}
            ))
            mgr.wait_until_finished()
    mgr.save(epochs, args=ocp.args.StandardSave(
        {"params": state.embedder_params,
         "ge2e": {"w": np.asarray(state.ge2e.w), "b": np.asarray(state.ge2e.b)}}
    ))
    mgr.wait_until_finished()
    return state


def evaluate_eer(
    embedder: SpeechEmbedder,
    params,
    dataset: SpeakerChunkDataset,
    n_speakers: int = 6,
    m_utts: int = 10,
    epochs: int = 10,
    thresholds=None,
) -> Tuple[float, float]:
    """Speaker-verification equal error rate.

    Reference test() (train_speech_embedder.py:387-460): split each speaker's
    M utterances into enrollment/verification halves, build enrollment
    centroids, sweep thresholds over the cosine-similarity matrix, report the
    threshold where FAR == FRR. Returns (avg_EER, threshold).
    """
    assert m_utts % 2 == 0
    if thresholds is None:
        thresholds = [0.01 * i + 0.5 for i in range(50)]

    apply = jax.jit(
        lambda p, x: embedder.apply({"params": p}, x, deterministic=True)["embeddings"]
    )

    total_eer = 0.0
    best_thresh = 0.0  # averaged over epochs alongside the EER
    count = 0
    for _ in range(epochs):
        mels, _ = dataset.sample_batch(n_speakers, variable_length=False)
        emb = np.asarray(apply(params, jnp.asarray(mels)))
        emb = emb.reshape(n_speakers, m_utts, -1)
        enroll, verify = emb[:, : m_utts // 2], emb[:, m_utts // 2 :]
        centroids = enroll.mean(axis=1)  # (N, D)
        centroids /= np.linalg.norm(centroids, axis=-1, keepdims=True) + 1e-12
        vn = verify / (np.linalg.norm(verify, axis=-1, keepdims=True) + 1e-12)
        sim = np.einsum("nmd,kd->nmk", vn, centroids)  # (N, M/2, N)

        m_half = m_utts // 2
        best = None
        for thres in thresholds:
            hits = sim > thres
            far = sum(
                hits[i].sum() - hits[i, :, i].sum() for i in range(n_speakers)
            ) / ((n_speakers - 1) * m_half * n_speakers)
            frr = sum(
                m_half - hits[i, :, i].sum() for i in range(n_speakers)
            ) / (m_half * n_speakers)
            if best is None or abs(far - frr) < best[0]:
                best = (abs(far - frr), (far + frr) / 2, thres)
        total_eer += best[1]
        best_thresh += best[2]
        count += 1
    return total_eer / max(count, 1), best_thresh / max(count, 1)
