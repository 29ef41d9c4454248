"""Training loop + evaluation.

Reference control flow (train.py:30-293): epoch-less `while True` over the
grouped loader; per real batch one optimizer step (the three backward passes
are fused into the single jitted train step, train/step.py); periodic
log/synth/val/save; hard stop at total_step.

Batches are length-bucketed (data/dataset.py) so the jitted step compiles a
handful of shapes, then the loop is pure dispatch.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import CheckpointManager
from ..core.config import ExperimentConfig
from ..data.dataset import ConcatDataset, Dataset
from ..data.loader import GroupedLoader
from ..models import FastSpeech2
from ..parallel.mesh import (
    data_parallel_size,
    make_mesh,
    replicate,
    shard_batch,
    shard_params,
)
from ..utils.logging import Logger, log_losses
from .optim import make_optimizer
from .state import TrainState, create_train_state
from .step import make_eval_step, make_train_step


def batch_to_device(batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    return {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if k not in ("ids", "raw_texts")
    }


def _pack_batch(raw: Dict[str, np.ndarray]):
    """Flatten a batch dict into one f32 buffer (+ static unpack spec).
    Integer fields are cast to int32 and BITCAST into the f32 buffer, so the
    round trip is exact for every dtype."""
    parts, spec = [], []
    for k in sorted(raw):
        v = np.asarray(raw[k])
        if np.issubdtype(v.dtype, np.integer) or v.dtype == np.bool_:
            parts.append(np.ascontiguousarray(
                v.astype(np.int32)).reshape(-1).view(np.float32))
            spec.append((k, v.shape, "i"))
        else:
            parts.append(v.astype(np.float32).reshape(-1))
            spec.append((k, v.shape, "f"))
    return np.concatenate(parts), tuple(spec)


@functools.lru_cache(maxsize=256)
def _unpack_fn(spec):
    """Jitted on-device unpacker for _pack_batch's buffer (cached per
    bucket-shape spec)."""

    def unpack(buf):
        out, off = {}, 0
        for k, shape, kind in spec:
            n = int(np.prod(shape, dtype=np.int64))
            x = buf[off : off + n].reshape(shape)
            if kind == "i":
                x = jax.lax.bitcast_convert_type(x, jnp.int32)
            out[k] = x
            off += n
        return out

    return jax.jit(unpack)


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        model: FastSpeech2,
        state: TrainState,
        train_loader: GroupedLoader,
        val_dataset: Optional[Dataset] = None,
        use_clf: bool = False,
        ganlike: bool = False,
        discriminator=None,
        discriminator_params=None,
        vocoder=None,
        seed: int = 0,
        mesh=None,
        rng_impl: str = "rbg",
        clf_featurization: str = "model",
    ):
        self.cfg = cfg
        self.model = model
        self.train_loader = train_loader
        self.val_dataset = val_dataset
        self.vocoder = vocoder
        # kept for introspection (the step closures capture them): tests
        # assert the frozen --use_clf discriminator is the loaded checkpoint
        self.discriminator = discriminator
        self.discriminator_params = discriminator_params

        # Production multi-device path (reference nn.DataParallel toggle,
        # train.py:67-68): params tp-sharded per parallel/mesh rules (pure
        # replication at n_model=1), optimizer moments likewise, batches
        # dp-sharded over the 'data' axis; XLA inserts the gradient psum.
        self.mesh = mesh
        if mesh is not None:
            state = state.replace(
                params=shard_params(state.params, mesh),
                batch_stats=replicate(state.batch_stats, mesh),
                opt_state=shard_params(state.opt_state, mesh),
            )
        self.state = state

        t = cfg.train
        self.total_step = t.step.total_step
        self.log_step = t.step.log_step
        self.synth_step = t.step.synth_step
        self.val_step = t.step.val_step
        self.save_step = t.step.save_step

        self.ganlike = ganlike
        if ganlike:
            from .step import make_ganlike_train_step

            # donate the incoming TrainState: params/opt-state buffers are
            # reused in place, halving their transient HBM footprint
            self.train_step_fn = jax.jit(
                make_ganlike_train_step(
                    model,
                    discriminator,
                    pitch_feature_level=cfg.preprocess.pitch.feature,
                    energy_feature_level=cfg.preprocess.energy.feature,
                    use_speaker_prior=cfg.model.multi_speaker,
                    lambd=t.lambda_,
                    total_step=self.total_step,
                    rng_impl=rng_impl,
                    grad_acc_step=cfg.train.optimizer.grad_acc_step,
                ),
                donate_argnums=(0,),
            )
        else:
            self.train_step_fn = jax.jit(
                make_train_step(
                    model,
                    pitch_feature_level=cfg.preprocess.pitch.feature,
                    energy_feature_level=cfg.preprocess.energy.feature,
                    use_speaker_prior=cfg.model.multi_speaker,
                    use_clf=use_clf,
                    use_jdit=cfg.model.jdit.use_jdit,
                    discriminator=discriminator,
                    discriminator_params=discriminator_params,
                    lambd=t.lambda_,
                    total_step=self.total_step,
                    rng_impl=rng_impl,
                    clf_featurization=clf_featurization,
                ),
                donate_argnums=(0,),
            )
        self.eval_step_fn = jax.jit(
            make_eval_step(
                model,
                pitch_feature_level=cfg.preprocess.pitch.feature,
                energy_feature_level=cfg.preprocess.energy.feature,
                use_speaker_prior=cfg.model.multi_speaker,
                param_key="model" if ganlike else None,
            )
        )

        self.ckpt = CheckpointManager(
            t.path.ckpt_path, max_to_keep=t.step.keep_last)
        # host-side mirror of the in-graph Noam schedule, for LR telemetry
        # (exact at grad_acc_step=1; under accumulation the in-graph count
        # advances once per accumulated update)
        from .optim import noam_schedule

        self._lr_fn = noam_schedule(
            cfg.model.transformer.encoder_hidden,
            cfg.train.optimizer.warm_up_step,
            cfg.train.optimizer.anneal_steps,
            cfg.train.optimizer.anneal_rate,
        )
        self.train_logger = Logger(os.path.join(t.path.log_path, "train"))
        self.val_logger = Logger(os.path.join(t.path.log_path, "val"))
        # typed key carries the PRNG impl; the step receives raw key data and
        # re-wraps it (rbg = TPU hardware generator for the dropout masks,
        # +12% step rate vs threefry; see make_train_step)
        self.rng = jax.random.key(seed, impl=rng_impl)
        # multi-host: every process computes (collectives need all ranks);
        # only the lead process writes logs/figures
        self.is_lead = jax.process_index() == 0
        self.single_process = jax.process_count() == 1

    # ------------------------------------------------------------------
    def _place_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        """Host batch -> device arrays, dp-sharded over the mesh when the
        batch size divides the 'data' axis (partial tail batches fall back to
        replication: correctness over speed). Raw numpy goes straight to the
        mesh placement so multi-process global arrays build correctly.

        Single-device path: the ~10 per-field host->device transfers are
        SYNCHRONOUS round trips on a remoted backend (measured: transfers
        block while compute dispatches pipeline, pinning the production
        trainer at ~8 steps/s when the same math benches at 42). The batch
        is packed into ONE f32 buffer (ints bitcast) = one transfer, and
        unpacked on-device by a cached jitted slicer."""
        raw = {k: v for k, v in batch.items() if k not in ("ids", "raw_texts")}
        if self.mesh is None or (self.mesh.devices.size == 1
                                 and self.single_process):
            buf, spec = _pack_batch(raw)
            # on a 1-device mesh the unpacked arrays are already fully
            # addressable on the right device; no resharding round trip
            return _unpack_fn(spec)(jnp.asarray(buf))
        b = raw["speakers"].shape[0]
        if b % self.mesh.shape["data"] == 0:
            return shard_batch(raw, self.mesh)
        return replicate(raw, self.mesh)

    # ------------------------------------------------------------------
    def fit(self, restore_step: int = 0, max_steps: Optional[int] = None,
            verbose: bool = True) -> TrainState:
        step = restore_step + 1
        stop_at = min(self.total_step, (restore_step + max_steps) if max_steps else self.total_step)
        log_path = os.path.join(self.cfg.train.path.log_path, "train")
        os.makedirs(log_path, exist_ok=True)

        # Deterministic resume: position the data stream where the original
        # run would be at restore_step (loader shuffles are a pure function
        # of (seed, epoch)), so a restored run replays the exact remaining
        # batches instead of restarting epoch 0. Skipped batches are loaded
        # and discarded — a one-time sub-epoch cost.
        skip = 0
        bpe = getattr(self.train_loader, "batches_per_epoch", 0)
        if restore_step and bpe:
            self.train_loader.epoch = restore_step // bpe
            skip = restore_step % bpe

        # Preemption-safe shutdown (beyond reference parity: crash = rerun
        # with --restore_step there, SURVEY §5). SIGTERM/SIGINT set a flag;
        # the loop finishes the in-flight step, saves a checkpoint at the
        # CURRENT step, and returns — `--restore_step <printed step>` resumes
        # exactly. Handlers install only in the main thread (tests drive
        # fit() from workers) and only single-process: in --multihost runs a
        # signal landing on one host at a different step boundary would
        # strand the others in collectives/the orbax save barrier, so
        # multi-host preemption must come from the orchestrator (stop all
        # ranks, resume from the last periodic save_step checkpoint).
        preempted = {"flag": False}
        prev_handlers = {}

        def _on_signal(signum, frame):
            preempted["flag"] = True

        if self.single_process:
            try:
                import signal as _signal

                for s in (_signal.SIGTERM, _signal.SIGINT):
                    prev_handlers[s] = _signal.signal(s, _on_signal)
            except ValueError:
                pass  # not the main thread

        t_start = time.time()
        try:
            return self._fit_loop(step, stop_at, log_path, t_start, verbose,
                                  preempted, skip)
        finally:
            # restore on EVERY exit path: a handler left bound after an
            # exception would swallow Ctrl-C for the rest of the process
            if prev_handlers:
                import signal as _signal

                for s, h in prev_handlers.items():
                    _signal.signal(s, h)

    def _fit_loop(self, step, stop_at, log_path, t_start, verbose, preempted,
                  skip=0):
        done = False
        while not done:
            for group in self.train_loader:
                for batch in group:
                    if skip > 0:  # fast-forwarding to the restore position
                        skip -= 1
                        continue
                    # per-step key is a pure function of (seed, step), so a
                    # restored run draws the same dropout/shuffle randomness
                    # the original would have at that step
                    sub = jax.random.fold_in(self.rng, step)
                    # numpy key DATA: multi-process jit treats host values as
                    # replicated (identical seeds on every process); the step
                    # re-wraps it under the configured impl
                    self.state, metrics = self.train_step_fn(
                        self.state, self._place_batch(batch),
                        np.asarray(jax.random.key_data(sub)),
                    )

                    if step % self.log_step == 0 and self.is_lead:
                        m = jax.device_get(metrics)
                        losses = [m.total, m.mel, m.postnet_mel, m.pitch, m.energy, m.duration]
                        log_losses(self.train_logger, step, losses,
                                   eloss=m.speaker_prior, dloss=m.dloss)
                        self.train_logger.add_scalar(
                            "Training/learning_rate",
                            float(self._lr_fn(step - 1)), step)
                        msg1 = f"Step {step}/{self.total_step}, "
                        msg2 = (
                            "Total Loss: {:.4f}, Mel Loss: {:.4f}, Mel PostNet Loss: {:.4f}, "
                            "Pitch Loss: {:.4f}, Energy Loss: {:.4f}, Duration Loss: {:.4f}"
                        ).format(*[float(x) for x in losses])
                        with open(os.path.join(log_path, "log.txt"), "a") as f:
                            f.write(msg1 + msg2 + "\n")
                        if verbose:
                            rate = step / max(time.time() - t_start, 1e-9)
                            print(msg1 + msg2 + f" [{rate:.1f} steps/s]")

                    # synth fetches dp-sharded activations, which are not
                    # fully addressable across hosts: single-process telemetry
                    if step % self.synth_step == 0 and self.single_process:
                        try:
                            self.synth_sample(batch, step)
                        except Exception as e:  # synth is best-effort telemetry
                            print(f"synth_step failed: {e}")

                    if step % self.val_step == 0 and self.val_dataset is not None:
                        self.evaluate(step)

                    if step % self.save_step == 0:
                        self.ckpt.save(step, self.state)

                    if preempted["flag"]:
                        if step % self.save_step != 0:  # not already saved above
                            self.ckpt.save(step, self.state)
                        if self.is_lead:
                            print(f"preempted: checkpoint saved at step {step}; "
                                  f"resume with --restore_step {step}")
                        done = True
                        break

                    if step >= stop_at:
                        done = True
                        break
                    step += 1
                if done:
                    break
            if done:
                break
        return self.state

    # ------------------------------------------------------------------
    def synth_sample(self, batch: Dict[str, np.ndarray], step: int,
                     logger=None, tag_prefix: str = "Training") -> None:
        """Reference synth_step hook (train.py:225-260 + utils/tools.py
        synth_one_sample): render prediction-vs-GT mel figures with
        pitch/energy overlays for the first batch item; vocode both when a
        vocoder is attached."""
        from ..utils.logging import plot_mel

        logger = logger or self.train_logger
        losses, eloss, out = self.eval_step_fn(self.state, self._place_batch(batch))
        i = 0
        mel_len = int(np.asarray(out.mel_len)[i])
        src_len = int(np.asarray(out.src_len)[i])
        if mel_len == 0:
            return
        mel_pred = np.asarray(out.postnet_mel)[i, :mel_len].T
        mel_gt = np.asarray(batch["mels"])[i, :mel_len].T
        duration = np.asarray(batch["durations"])[i, :src_len]
        # phoneme-level targets expand by duration; frame-level are already
        # per-frame (reference utils/tools.py:181-190)
        if self.cfg.preprocess.pitch.feature == "phoneme_level":
            pitch = np.repeat(np.asarray(batch["pitches"])[i, :src_len], duration)[:mel_len]
        else:
            pitch = np.asarray(batch["pitches"])[i, :mel_len]
        if self.cfg.preprocess.energy.feature == "phoneme_level":
            energy = np.repeat(np.asarray(batch["energies"])[i, :src_len], duration)[:mel_len]
        else:
            energy = np.asarray(batch["energies"])[i, :mel_len]
        stats = (
            list(self.cfg.stats.pitch) + list(self.cfg.stats.energy[:2])
            if self.cfg.stats is not None
            else [-1, 1, 0, 1, -1, 1]
        )
        fig = plot_mel(
            [(mel_pred, pitch, energy), (mel_gt, pitch, energy)],
            stats,
            ["Synthetized Spectrogram", "Ground-Truth Spectrogram"],
        )
        logger.add_figure(
            f"{tag_prefix}/step_{step}_{batch['ids'][i]}", fig, step
        )
        import matplotlib.pyplot as plt

        plt.close(fig)
        if out.alignments is not None:
            from ..utils.logging import plot_alignment

            afig = plot_alignment(np.asarray(out.alignments)[i, :mel_len, :src_len].T)
            logger.add_figure(f"{tag_prefix}/step_{step}_alignment", afig, step)
            plt.close(afig)
        if self.vocoder is not None:
            from ..infer.vocoder import vocoder_infer

            wavs = vocoder_infer(
                jnp.asarray(np.stack([np.asarray(out.postnet_mel)[i, :mel_len],
                                      np.asarray(batch["mels"])[i, :mel_len]])),
                self.vocoder,
            )
            sr = self.cfg.preprocess.audio.sampling_rate
            logger.add_audio(
                f"{tag_prefix}/step_{step}_{batch['ids'][i]}_synthesized",
                wavs[0].astype(np.float32) / 32768.0, step, sr)
            logger.add_audio(
                f"{tag_prefix}/step_{step}_{batch['ids'][i]}_reconstructed",
                wavs[1].astype(np.float32) / 32768.0, step, sr)

    # ------------------------------------------------------------------
    def evaluate(self, step: int) -> List[float]:
        """Dataset-size-weighted mean losses over val.txt
        (reference evaluate.py:18-75)."""
        loader = GroupedLoader(
            self.val_dataset, batch_size=self.train_loader.batch_size,
            group_size=1, shuffle=False,
        )
        sums = None
        eloss_sum = 0.0
        count = 0
        last_batch = None
        for group in loader:
            for batch in group:
                n = len(batch["ids"])
                losses, eloss, _ = self.eval_step_fn(self.state, self._place_batch(batch))
                losses = [float(x) for x in losses]
                if sums is None:
                    sums = [0.0] * len(losses)
                sums = [s + l * n for s, l in zip(sums, losses)]
                eloss_sum += float(eloss) * n
                count += n
                last_batch = batch
        means = [s / max(count, 1) for s in sums] if sums else []
        if means and self.is_lead:
            log_losses(self.val_logger, step, means, eloss=eloss_sum / max(count, 1))
            msg = (
                "Validation Step {}, Total Loss: {:.4f}, Mel Loss: {:.4f}, "
                "Mel PostNet Loss: {:.4f}, Pitch Loss: {:.4f}, Energy Loss: {:.4f}, "
                "Duration Loss: {:.4f}"
            ).format(step, *means)
            val_log = os.path.join(self.cfg.train.path.log_path, "val")
            os.makedirs(val_log, exist_ok=True)
            with open(os.path.join(val_log, "log.txt"), "a") as f:
                f.write(msg + "\n")
        # one synthesized val sample per evaluation (reference evaluate.py:83-111)
        if last_batch is not None and self.single_process:
            try:
                self.synth_sample(last_batch, step, logger=self.val_logger,
                                  tag_prefix="Validation")
            except Exception as e:
                print(f"val synth sample failed: {e}")
        return means


# ----------------------------------------------------------------------
def build_corpus_dict(cfg, name):
    """Per-corpus preprocess dict in the Dataset constructor's schema
    (the raw-yaml shape the reference passes around, train.py:38-44)."""
    cc = cfg.corpora[name]
    return {
        "dataset": cc.dataset,
        "path": {"raw_path": cc.raw_path, "preprocessed_path": cc.preprocessed_path},
        "preprocessing": {
            "val_size": cfg.preprocess.val_size,
            "test_size": cfg.preprocess.test_size,
            "audio": {"sampling_rate": cfg.preprocess.audio.sampling_rate,
                      "max_wav_value": cfg.preprocess.audio.max_wav_value},
            "stft": vars(cfg.preprocess.stft),
            "mel": {"n_mel_channels": cfg.preprocess.mel.n_mel_channels,
                    "mel_fmin": cfg.preprocess.mel.mel_fmin,
                    "mel_fmax": cfg.preprocess.mel.mel_fmax},
            "pitch": vars(cfg.preprocess.pitch),
            "energy": vars(cfg.preprocess.energy),
            "speaker_generation": {"metadata": cfg.preprocess.speaker_generation.metadata},
        },
        "text": {"text_cleaners": cc.text_cleaners, "language": cc.language},
        "accent": {"use_accent": cc.use_accent},
    }


def build_experiment(
    cfg: ExperimentConfig,
    corpora: Optional[List[str]] = None,
    use_clf: bool = False,
    ganlike: bool = False,
    restore_step: int = 0,
    checkpoint: Optional[str] = None,
    seed: int = 0,
    text_bucket: int = 16,
    mel_bucket: int = 64,
    dtype=jnp.float32,
    n_devices: Optional[int] = None,
    n_model: int = 1,
    use_flash: bool = False,
    val_split: str = "val.txt",
    rng_impl: str = "rbg",
    param_storage: str = "f32",
    clf_featurization: str = "model",
):
    """Datasets + model + optimizer + Trainer from a config dir
    (the CLI composition root; reference train.py:30-105).

    A (data, model) mesh over the visible devices is always built: `n_devices`
    caps how many devices participate (default all), `n_model` is the
    tensor-parallel axis size; the data axis is the largest batch-size divisor
    that fits the remaining devices. This replaces the reference's
    nn.DataParallel toggle (train.py:67-68) with XLA-partitioned sharding."""
    corpora = corpora or list(cfg.corpora)
    assert corpora, "no corpora configured"

    def corpus_dict(name):
        return build_corpus_dict(cfg, name)

    bs = cfg.train.optimizer.batch_size
    train_sets = [
        Dataset("train.txt", corpus_dict(c), batch_size=bs, sort=True,
                drop_last=True, text_bucket=text_bucket, mel_bucket=mel_bucket)
        for c in corpora
    ]
    # the reference's standalone evaluate.py always reads val.txt
    # (evaluate.py:32-33); val_split="test.txt" evaluates the held-out split
    val_sets = [
        Dataset(val_split, corpus_dict(c), batch_size=bs, sort=False,
                drop_last=False, text_bucket=text_bucket, mel_bucket=mel_bucket)
        for c in corpora
    ]
    if len(train_sets) > 1:
        train_ds = ConcatDataset(cfg.config_dir, train_sets)
        val_ds = ConcatDataset(cfg.config_dir, val_sets)
    else:
        train_ds, val_ds = train_sets[0], val_sets[0]

    loader = GroupedLoader(
        train_ds, batch_size=bs, group_size=cfg.train.group_size, seed=seed,
        drop_last=False,
    )

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n_data = data_parallel_size(bs, max(len(devices) // n_model, 1))
    mesh = make_mesh(n_data=n_data, n_model=n_model, devices=devices)

    model = FastSpeech2.from_config(cfg, dtype=dtype, use_flash=use_flash)

    # init with one real batch's shapes (reprocess directly: collate would
    # drop a sub-batch_size probe when drop_last is set)
    n_probe = min(2, len(train_ds))
    probe_items = [train_ds[i] for i in range(n_probe)]
    proto = train_ds._proto if isinstance(train_ds, ConcatDataset) else train_ds
    probe = proto.reprocess(probe_items, list(range(n_probe)))
    pb = batch_to_device(probe)
    init_rngs = {"params": jax.random.PRNGKey(seed),
                 "dropout": jax.random.PRNGKey(seed + 100)}
    variables = model.init(
        init_rngs,
        pb["speakers"], pb["texts"], pb["src_lens"], probe["mels"].shape[1],
        mels=pb["mels"], mel_lens=pb["mel_lens"], p_targets=pb["pitches"],
        e_targets=pb["energies"], d_targets=pb["durations"], accents=pb["accents"],
        speaker_meta=pb["speaker_meta"],
    )
    # ganlike nests params as {"model", "discriminator"}; the reference clips
    # only model.parameters() there while its single optimizer updates both
    # (train_ganlike.py:85,173) — scope the clip to match. LSTM-bearing
    # variants (ganlike discriminator, JDIT teacher) get the two-bias Adam
    # compat so update dynamics match torch's nn.LSTM/LSTMCell exactly.
    tx = make_optimizer(cfg.train.optimizer, cfg.model.transformer.encoder_hidden,
                        clip_subtree="model" if ganlike else None,
                        torch_lstm_bias_compat=ganlike or cfg.model.jdit.use_jdit,
                        param_storage=param_storage)
    if param_storage in ("bf16", "bf16_moments"):
        # bf16 parameter storage: the fwd/bwd passes read half the bytes;
        # the f32 master lives in the optimizer state (optim.with_master_params)
        variables = dict(variables)
        variables["params"] = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            variables["params"])

    discriminator = discriminator_params = None
    if use_clf or ganlike:
        from ..models.speaker_encoder import SpeechEmbedder

        n_mels = cfg.preprocess.mel.n_mel_channels
        dpath = cfg.train.discriminator_path
        if dpath:
            # a configured discriminator_path MUST load (reference
            # train.py:74-91 torch.load would crash too) — silently training
            # against a random discriminator would invalidate the experiment
            if not os.path.exists(dpath):
                raise FileNotFoundError(
                    f"train.yaml discriminator_path does not exist: {dpath}")
            discriminator = SpeechEmbedder(n_mels=n_mels)
            discriminator_params = load_ge2e_checkpoint(dpath, discriminator)
            # the pretrained encoder defines the discriminator dims
            # (reference train.py:74-91 loads the ckpt as-is); model.yaml's
            # discriminator.hidden only sizes fresh random inits below
            hidden = int(np.shape(
                discriminator_params["OptimizedLSTMCell_0"]["hf"]["bias"])[0])
            proj = int(np.shape(discriminator_params["projection"]["kernel"])[1])
            discriminator = SpeechEmbedder(n_mels=n_mels, hidden=hidden, proj=proj)
        else:
            discriminator = SpeechEmbedder(n_mels=n_mels,
                                           hidden=cfg.model.discriminator.hidden)
            chunk = jnp.zeros((2, 150, n_mels))
            discriminator_params = discriminator.init(
                jax.random.PRNGKey(seed + 1), chunk
            )["params"]

    if ganlike:
        # one optimizer over FS2 + discriminator (reference train_ganlike.py:83-88)
        variables = {
            "params": {"model": variables["params"],
                       "discriminator": discriminator_params},
            "batch_stats": variables.get("batch_stats", {}),
        }
    state = create_train_state(model, variables, tx)

    trainer = Trainer(
        cfg, model, state, loader, val_dataset=val_ds, use_clf=use_clf,
        ganlike=ganlike,
        discriminator=discriminator, discriminator_params=discriminator_params,
        seed=seed, mesh=mesh, rng_impl=rng_impl,
        clf_featurization=clf_featurization,
    )

    if checkpoint is not None:
        # warm start model-only from another run (reference --checkpoint)
        other = CheckpointManager(os.path.dirname(checkpoint) or checkpoint)
        step = other.latest_step()
        trainer.state = other.restore_model_only(step, trainer.state)
    if restore_step:
        trainer.state = trainer.ckpt.restore(restore_step, trainer.state)

    return trainer


def load_ge2e_checkpoint(path: str, discriminator):
    """Load a GE2E speaker-encoder checkpoint. Supports our orbax layout and
    the reference's torch {'embedder_net': state_dict} format
    (train_speech_embedder.py:218-222) via weight conversion."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(os.path.abspath(path))
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no GE2E checkpoint steps under {path}")
        # saved via StandardSave (train/ge2e.py) — restore needs the matching
        # args or orbax can't resolve the handler and returns nothing
        restored = mgr.restore(step, args=ocp.args.StandardRestore())
        return restored["params"]
    # torch checkpoint
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    state = ckpt.get("embedder_net", ckpt)
    return convert_torch_ge2e(state, discriminator)


def convert_torch_ge2e(state_dict, discriminator, bias_mode="sum"):
    """torch LSTM/Linear weights -> flax SpeechEmbedder params.
    bias_mode="mean" when converting Adam-moment dicts (see compat
    _lstm_cell)."""
    import numpy as np

    from ..compat.torch_fs2 import _lstm_cell

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = {}
    for i in range(discriminator.n_layers):
        # gate-order split + bias fold shared with the jdit converter
        params[f"OptimizedLSTMCell_{i}"] = _lstm_cell(sd, "LSTM_stack",
                                                      f"_l{i}", bias_mode)
    params["projection"] = {
        "kernel": sd["projection.linear_layer.weight"].T,
        "bias": sd["projection.linear_layer.bias"],
    }
    if discriminator.use_da and "da_classifier.classifier.layer.linear_0.linear_layer.weight" in sd:
        for j in range(2):
            params[f"da_linear_{j}"] = {
                "kernel": sd[f"da_classifier.classifier.layer.linear_{j}.linear_layer.weight"].T,
                "bias": sd[f"da_classifier.classifier.layer.linear_{j}.linear_layer.bias"],
            }
        params["da_linear_out"] = {
            "kernel": sd["da_classifier.classifier.layer.linear_2.linear_layer.weight"].T,
            "bias": sd["da_classifier.classifier.layer.linear_2.linear_layer.bias"],
        }
    return params
