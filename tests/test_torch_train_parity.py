"""TRAINING-trajectory parity: the reference's exact torch update math
(three separate backwards + ScheduledOptim, /root/reference/train.py:145-206,
model/optimizer.py:5-51) vs our fused single-backward train step
(masg_tpu/train/step.py) from identical converted initial weights.

Forward parity (test_torch_parity.py) proves the graphs agree; this proves the
*training dynamics* agree — detach placement, masked-loss reductions, Noam
stepping, grad-accum scaling, and the adversarial schedule are exactly where
silent divergence would live. Dropout is disabled on both sides (monkeypatched
to identity) so the only nondeterminism left is the speaker shuffle, which the
test injects identically into both frameworks.
"""

import importlib
import json
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
REF_GE2E = os.path.join(REF, "Multilingual-Speaker-Encoder-with-Domain-Adaptation")

B, L, T = 4, 9, 40
N_SPEAKERS = 4
WARMUP = 10  # tiny warmup so the lr is large enough to move weights
# Adam eps for BOTH frameworks. The semantics (eps outside the sqrt, after
# bias correction) are identical and config-plumbed on both sides; the VALUE
# here is 1e-6 instead of the production 1e-9 because coordinates with
# |g| ~ eps amplify f64 rounding noise by ~1/eps (the update's derivative
# peaks there), which turns bit-level dot-product reassociation into visible
# trajectory chaos. At 1e-6 that amplification caps at ~1e6*1e-13 = 1e-7,
# so the multi-step assertions measure SEMANTICS, not chaos.
EPS = 1e-6


def _import_ref(name):
    """Import reference model/<name>.py under the refmodel package without
    triggering model/__init__ (drags in POT + hardcoded GE2E hparam path)."""
    for mod_name, attrs in [("unidecode", {"unidecode": lambda s: s}),
                            ("inflect", {"engine": lambda: None})]:
        if mod_name not in sys.modules:
            mod = types.ModuleType(mod_name)
            for a, v in attrs.items():
                setattr(mod, a, v)
            sys.modules[mod_name] = mod
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "refmodel" not in sys.modules:
        pkg = types.ModuleType("refmodel")
        pkg.__path__ = [os.path.join(REF, "model")]
        sys.modules["refmodel"] = pkg
    return importlib.import_module(f"refmodel.{name}")


def _import_ref_ge2e(hidden=64, num_layer=2, proj=32):
    """Reference SpeechEmbedder with the hardcoded-path hparam stubbed (same
    shim as test_ge2e_torch_parity.py). One module alias PER SIZE: the
    reference module captures hp at import, so different sizes must never
    share sys.modules entries (and neither must test_ge2e_torch_parity's
    production-sized 'refge2e' stub — that collision broke full-suite runs).

    The parity tests default to a discriminator sized down from production
    (256x3/64): they exercise the BCE/schedule/chunking SEMANTICS, and the
    f64 CPU compile of the full-size LSTM dominated their wall time."""

    class _Dot(dict):
        __getattr__ = dict.__getitem__

    hp = _Dot(
        data=_Dot(nmels=80, tisv_frame=150, sr=22050, hop=256, window=1024,
                  nfft=1024),
        model=_Dot(architecture="LSTM", hidden=hidden, num_layer=num_layer,
                   proj=proj, da=True, da_on="language", da_startpoint=0.0,
                   loss="softmax"),
        train=_Dot(N=4, M=3),
    )
    alias = f"refge2e_{hidden}x{num_layer}p{proj}"
    if alias not in sys.modules:
        pkg = types.ModuleType(alias)
        pkg.__path__ = [REF_GE2E]
        sys.modules[alias] = pkg
        hparam_mod = types.ModuleType(f"{alias}.hparam")
        hparam_mod.hparam = hp
        sys.modules[f"{alias}.hparam"] = hparam_mod
        utils_mod = types.ModuleType(f"{alias}.utils")
        # cheap fakes: GE2ELoss computes these on its similarity path, but
        # the ganlike trainer discards that output and backprops only the
        # BCE da_loss (train_ganlike.py:164-167), so zeros change nothing
        utils_mod.get_similarity = lambda e: torch.zeros(())
        utils_mod.get_contrast_loss = lambda s: s * 0
        utils_mod.get_softmax_loss = lambda s: s * 0
        utils_mod.count_label = lambda hp: 1
        sys.modules[f"{alias}.utils"] = utils_mod
    return importlib.import_module(f"{alias}.speech_embedder_net")


def _ref_configs(tmpdir, use_jdit=False, hidden=64):
    with open(os.path.join(tmpdir, "speakers.json"), "w") as f:
        json.dump({f"s{i}": [i, "M" if i % 2 == 0 else "F",
                             "ja" if i < 2 else "en"] for i in range(N_SPEAKERS)}, f)
    with open(os.path.join(tmpdir, "stats.json"), "w") as f:
        json.dump({"pitch": [-2, 9, 0, 1], "energy": [-1.5, 8, 0, 1]}, f)
    pre = {
        "mel": {"n_mel_channels": 80},
        "pitch": {"feature": "phoneme_level"},
        "energy": {"feature": "phoneme_level"},
        "speaker_generation": {"metadata": {"gender": {"M": 0, "F": 1},
                                            "language": {"ja": 0, "en": 1}}},
        # JDIT.__init__ reads the nested preprocessing tree for its
        # (inference-only) time_scaler (model/jdit.py:499)
        "preprocessing": {"stft": {"hop_length": 256},
                          "audio": {"sampling_rate": 22050}},
    }
    mdl = {
        "transformer": {"encoder_layer": 2, "encoder_head": 2,
                        "encoder_hidden": hidden, "decoder_layer": 2,
                        "decoder_head": 2, "decoder_hidden": hidden,
                        "conv_filter_size": 128, "conv_kernel_size": [9, 1],
                        "encoder_dropout": 0.2, "decoder_dropout": 0.2},
        "variance_predictor": {"filter_size": 64, "kernel_size": 3,
                               "dropout": 0.5},
        "variance_embedding": {"pitch_quantization": "linear",
                               "energy_quantization": "linear", "n_bins": 256},
        "jdit": {"use_jdit": use_jdit},
        "multi_speaker": True,
        "max_seq_len": 1000,
        "speaker_generation": {"GMM_mixtures": 3},
    }
    return pre, mdl


def _our_config(grad_acc_step=1, use_jdit=False, hidden=64):
    from masg_tpu.core.config import (ExperimentConfig, ModelConfig,
                                      PreprocessConfig, Stats, TrainConfig)

    cfg = ExperimentConfig(
        preprocess=PreprocessConfig(),
        model=ModelConfig(),
        train=TrainConfig(),
        stats=Stats(pitch=(-2.0, 9.0, 0.0, 1.0), energy=(-1.5, 8.0, 0.0, 1.0)),
        speakers={f"s{i}": [i, "M" if i % 2 == 0 else "F",
                            "ja" if i < 2 else "en"] for i in range(N_SPEAKERS)},
    )
    cfg.model.transformer.encoder_layer = 2
    cfg.model.transformer.decoder_layer = 2
    cfg.model.transformer.encoder_hidden = hidden
    cfg.model.transformer.decoder_hidden = hidden
    cfg.model.transformer.conv_filter_size = 128
    cfg.model.variance_predictor.filter_size = 64
    cfg.model.jdit.use_jdit = use_jdit
    opt = cfg.train.optimizer
    opt.warm_up_step = WARMUP
    opt.grad_acc_step = grad_acc_step
    opt.betas = (0.9, 0.98)
    opt.eps = EPS
    opt.weight_decay = 0.0
    opt.grad_clip_thresh = 1.0
    return cfg


def _make_batches(n, seed=0):
    """n synthetic batches with static (B, L, T) shapes; durations padded 0.
    Floats are f64: both frameworks run in double so the only differences a
    tight tolerance can see are SEMANTIC, not f32 op-order noise (Adam's
    sign-like first steps amplify any noise on near-zero gradients by 2*lr)."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n):
        texts = rng.integers(1, 100, size=(B, L)).astype(np.int64)
        src_lens = np.full(B, L, np.int64)
        src_lens[1] = L - 2
        texts[1, L - 2:] = 0
        accents = rng.integers(0, 5, size=(B, L)).astype(np.int64)
        durations = rng.integers(1, 4, size=(B, L)).astype(np.int64)
        durations[1, L - 2:] = 0
        mel_lens = durations.sum(1)
        mels = rng.normal(size=(B, T, 80))
        pitches = rng.normal(size=(B, L))
        energies = rng.normal(size=(B, L))
        speakers = rng.integers(0, N_SPEAKERS, size=B).astype(np.int64)
        meta = np.zeros((B, 4), np.float64)
        gender = rng.integers(0, 2, size=B)
        lang = rng.integers(0, 2, size=B)
        meta[np.arange(B), gender] = 1.0
        meta[np.arange(B), 2 + lang] = 1.0
        reorder = rng.permutation(B).astype(np.int64)
        batches.append(dict(
            texts=texts, src_lens=src_lens, accents=accents,
            durations=durations, mel_lens=mel_lens, mels=mels,
            pitches=pitches, energies=energies, speakers=speakers,
            meta=meta, reorder=reorder,
        ))
    return batches


@pytest.fixture
def no_dropout(monkeypatch):
    """Disable dropout in BOTH frameworks so trajectories are deterministic.
    (The reference's PostNet/prenet hardcode F.dropout with self.training,
    so zeroing config rates alone is not enough.)"""
    import flax.linen as fnn

    monkeypatch.setattr(
        torch.nn.functional, "dropout",
        lambda x, p=0.5, training=False, inplace=False: x,
    )
    monkeypatch.setattr(
        fnn.Dropout, "__call__",
        # identity, not orig(deterministic=True): modules that set
        # deterministic in the CONSTRUCTOR (JDIT's always-on prenet) reject
        # a second call-time value
        lambda self, x, deterministic=None, rng=None: x,
    )


def _torch_trajectory(batches, grad_acc_step, total_step, use_clf=False,
                      lambd=1.0, seed=0, tmpdir=None, use_jdit=False,
                      hidden=64, live_in=None, start_step=0,
                      return_live=False):
    """Replicates /root/reference/train.py:134-206 verbatim: forward, three
    backwards (FS2 loss / negated prior log-prob / scheduled adversarial),
    clip 1.0 every grad_acc_step, ScheduledOptim. Returns (per-step metric
    dicts, final state_dict); with return_live also (model, optim) so a
    segment can continue (the migration round-trip test). `live_in` resumes
    from an existing (model, optim) pair at step `start_step`."""
    fs2_mod = _import_ref("fastspeech2")
    loss_mod = _import_ref("loss")
    opt_mod = _import_ref("optimizer")
    pre, mdl = _ref_configs(tmpdir, use_jdit=use_jdit, hidden=hidden)

    if use_jdit:
        # correct the reference's inverted jdit attention-mask convention
        # (jdit.py:437-438 assumes True-at-valid; the vendored
        # get_mask_from_lengths returns True-at-pads -> NaN on full-length
        # rows). Same evident-intent fix as test_torch_parity.py's
        # test_jdit_forward_parity; our jax side masks pads directly.
        jdit_mod = _import_ref("jdit")
        if not getattr(jdit_mod, "_mask_fixed", False):
            orig_mask = jdit_mod.get_mask_from_lengths
            jdit_mod.get_mask_from_lengths = lambda lengths: ~orig_mask(lengths)
            jdit_mod._mask_fixed = True

    Loss = loss_mod.FastSpeech2Loss(pre, mdl)
    eLoss = loss_mod.SpeakerMetaEncLoss(pre, mdl)
    if live_in is not None:
        model, optim = live_in
    else:
        torch.manual_seed(seed)
        model = fs2_mod.FastSpeech2(pre, mdl, tmpdir).double()
        model.train()
        train_cfg = {"optimizer": {"betas": [0.9, 0.98], "eps": EPS,
                                   "weight_decay": 0.0, "warm_up_step": WARMUP,
                                   "anneal_steps": [300000, 400000, 500000],
                                   "anneal_rate": 0.3}}
        optim = opt_mod.ScheduledOptim(model, train_cfg, mdl,
                                       current_step=start_step)

    disc = None
    if use_clf:
        net_mod = _import_ref_ge2e()
        torch.manual_seed(seed + 100)
        disc = net_mod.SpeechEmbedder().double()
        disc.train()
    bce = torch.nn.BCEWithLogitsLoss(reduction="sum")

    traj = []
    step = start_step + 1
    for b in batches:
        batch = (
            None, None, torch.from_numpy(b["speakers"]),
            torch.from_numpy(b["texts"]), torch.from_numpy(b["src_lens"]), L,
            torch.from_numpy(b["mels"]), torch.from_numpy(b["mel_lens"]), T,
            torch.from_numpy(b["pitches"]), torch.from_numpy(b["energies"]),
            torch.from_numpy(b["durations"]),
        )
        accents = torch.from_numpy(b["accents"])
        speaker_meta = torch.from_numpy(b["meta"])
        output = model(*(batch[2:]), accents=accents,
                       speaker_meta=speaker_meta)
        if use_jdit:
            # reference train.py:150-154 with its two indexing bugs fixed by
            # evident intent: output is the 14-tuple (fastspeech2.py:113-130),
            # so Loss takes [:-4] (as written, runnable) but the jdit MSE
            # target is output[-4] == mel_jdit — the reference's output[-2]
            # is speaker_emb_p, a torch Distribution, and MSELoss on it
            # cannot run (single-speaker's [:-4] breaks Loss unpack instead)
            losses = Loss(batch, output[:-4])
            jdit_mse = torch.nn.MSELoss()(output[-4], batch[6])
            total_loss = (losses[0] + jdit_mse) / grad_acc_step
        else:
            losses = Loss(batch, output[:-2])
            total_loss = losses[0] / grad_acc_step
        total_loss.backward()

        eloss = eLoss(output[-1], output[-2])
        (-eloss / grad_acc_step).backward()

        rec = {"total": float(losses[0]), "mel": float(losses[1]),
               "postnet_mel": float(losses[2]), "pitch": float(losses[3]),
               "energy": float(losses[4]), "duration": float(losses[5]),
               "eloss": float(eloss), "dloss": 0.0}

        if use_clf:
            reorder = list(b["reorder"])
            speakers = torch.stack([batch[2][reorder[i]] for i in range(B)])
            meta_sh = torch.stack([speaker_meta[reorder[i]] for i in range(B)])
            batch2 = batch[:2] + (speakers,) + batch[3:]
            output2 = model(*(batch2[2:]), accents=accents,
                            speaker_meta=meta_sh)
            max_len = output2[0].shape[1]
            max_len_r = max_len // 150 + 1
            n_mels = output2[0].shape[2]
            batch_r_m = torch.cat(
                [output2[0],
                 torch.zeros(B, max_len_r * 150 - max_len, n_mels,
                             dtype=output2[0].dtype)], dim=1
            ).view(B * max_len_r, 150, n_mels)
            langs = meta_sh[:, 2].view(-1, 1).repeat(1, max_len_r).view(-1)
            # the reference hard-casts the discriminator input to f32
            # (speech_embedder_net.py:109 `x.float()`) — a no-op in its f32
            # production but fatal against .double() weights; disable the
            # cast for the duration of the call so BOTH sides run the
            # discriminator in f64
            orig_float = torch.Tensor.float
            torch.Tensor.float = lambda self: self
            try:
                disc_out = disc(batch_r_m)
            finally:
                torch.Tensor.float = orig_float
            dloss = bce(disc_out["da_lang_logits"], langs)
            import math
            dloss_ = dloss * (2 / (1 + math.exp(-10 * (step / total_step))) - 1) / len(langs)
            (dloss_ * lambd).backward()
            rec["dloss"] = float(dloss)

        if step % grad_acc_step == 0:
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            optim.step_and_update_lr()
            optim.zero_grad()
        traj.append(rec)
        step += 1
    if return_live:
        return traj, model.state_dict(), model, optim
    return traj, model.state_dict()


def _jax_trajectory(batches, grad_acc_step, total_step, init_sd,
                    use_clf=False, disc_sd=None, lambd=1.0, use_jdit=False,
                    hidden=64, torch_adam_sd=None, torch_model=None):
    """Runs our fused train step on the same batch stream from the converted
    torch initial weights, entirely in float64 (enable_x64)."""
    import jax

    with jax.enable_x64(True):
        import jax.numpy as jnp

        from masg_tpu.compat.torch_fs2 import convert_torch_fastspeech2
        from masg_tpu.models import FastSpeech2
        from masg_tpu.models.speaker_encoder import SpeechEmbedder
        from masg_tpu.train.optim import make_optimizer
        from masg_tpu.train.state import create_train_state
        from masg_tpu.train.step import make_train_step

        to64 = lambda tree: jax.tree.map(
            lambda x: x.astype(np.float64)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x, tree)

        cfg = _our_config(grad_acc_step, use_jdit=use_jdit, hidden=hidden)
        params, batch_stats = convert_torch_fastspeech2(
            init_sd, encoder_layers=2, decoder_layers=2)
        params, batch_stats = to64(params), to64(batch_stats)
        model = FastSpeech2.from_config(cfg, dtype=jnp.float64)
        # jdit's LSTM cells need the torch two-bias update compat, exactly
        # as build_experiment wires it (train/loop.py)
        tx = make_optimizer(cfg.train.optimizer, hidden,
                            torch_lstm_bias_compat=use_jdit)
        state = create_train_state(
            model, {"params": params, "batch_stats": batch_stats}, tx)
        if torch_adam_sd is not None:
            # mid-training migration: adopt the torch Adam moments + counts
            from masg_tpu.compat.torch_fs2 import import_torch_optimizer

            state = state.replace(opt_state=import_torch_optimizer(
                state.opt_state, torch_adam_sd, torch_model,
                encoder_layers=2, decoder_layers=2))

        disc = disc_params = None
        if use_clf:
            from masg_tpu.train.loop import convert_torch_ge2e

            disc = SpeechEmbedder(n_mels=80, hidden=64, n_layers=2, proj=32,
                                  dtype=jnp.float64)  # matches _import_ref_ge2e hp
            disc_params = to64(convert_torch_ge2e(disc_sd, disc))

        step_fn = jax.jit(make_train_step(
            model, use_clf=use_clf, discriminator=disc,
            discriminator_params=disc_params, lambd=lambd,
            total_step=total_step, use_jdit=use_jdit,
        ))
        traj = []
        key = jax.random.PRNGKey(0)
        for b in batches:
            sb = dict(
                speakers=jnp.asarray(b["speakers"].astype(np.int32)),
                texts=jnp.asarray(b["texts"].astype(np.int32)),
                src_lens=jnp.asarray(b["src_lens"].astype(np.int32)),
                mels=jnp.asarray(b["mels"]),
                mel_lens=jnp.asarray(b["mel_lens"].astype(np.int32)),
                pitches=jnp.asarray(b["pitches"]),
                energies=jnp.asarray(b["energies"]),
                durations=jnp.asarray(b["durations"].astype(np.int32)),
                accents=jnp.asarray(b["accents"].astype(np.int32)),
                speaker_meta=jnp.asarray(b["meta"]),
            )
            if use_clf:
                sb["reorder"] = jnp.asarray(b["reorder"].astype(np.int32))
            key, sub = jax.random.split(key)
            state, m = step_fn(state, sb, sub)
            traj.append({"total": float(m.total), "mel": float(m.mel),
                         "postnet_mel": float(m.postnet_mel),
                         "pitch": float(m.pitch), "energy": float(m.energy),
                         "duration": float(m.duration),
                         "eloss": float(m.speaker_prior),
                         "dloss": float(m.dloss)})
        # materialize on host inside the x64 context
        state = jax.device_get(state)
    return traj, state


def _assert_traj_match(ref_traj, our_traj, rtol, keys=None):
    keys = keys or ["total", "mel", "postnet_mel", "pitch", "energy",
                    "duration", "eloss", "dloss"]
    for i, (r, o) in enumerate(zip(ref_traj, our_traj)):
        for k in keys:
            np.testing.assert_allclose(
                o[k], r[k], rtol=rtol, atol=1e-8,
                err_msg=f"step {i + 1} loss '{k}' diverged: "
                        f"torch={r[k]:.6f} jax={o[k]:.6f}")


def test_training_trajectory_parity_plain(no_dropout, tmp_path):
    """6 steps of the plain multi-speaker path (FS2 loss + speaker prior):
    per-step loss trajectories must match the reference update math."""
    batches = _make_batches(6, seed=0)
    ref_traj, _ = _torch_trajectory(
        batches, grad_acc_step=1, total_step=30000, tmpdir=str(tmp_path))

    torch.manual_seed(0)  # rebuild identical init for conversion
    fs2_mod = _import_ref("fastspeech2")
    pre, mdl = _ref_configs(str(tmp_path))
    init = fs2_mod.FastSpeech2(pre, mdl, str(tmp_path)).double()
    init_sd = {k: v.numpy().copy() for k, v in init.state_dict().items()}

    our_traj, _ = _jax_trajectory(batches, 1, 30000, init_sd)
    # step 1 losses are pre-update (forward parity); later steps compound the
    # update math, so tolerance is the interesting part: 1e-3 relative over 6
    # aggressive-lr steps catches any detach/reduction/schedule divergence
    _assert_traj_match(ref_traj, our_traj, rtol=1e-5)


def test_training_trajectory_parity_grad_accum(no_dropout, tmp_path):
    """Same, with grad_acc_step=2: loss/k scaling, accumulate-2-then-update,
    and per-UPDATE (not per-microbatch) Noam stepping must all line up."""
    batches = _make_batches(6, seed=1)
    ref_traj, ref_sd = _torch_trajectory(
        batches, grad_acc_step=2, total_step=30000, tmpdir=str(tmp_path))

    torch.manual_seed(0)
    fs2_mod = _import_ref("fastspeech2")
    pre, mdl = _ref_configs(str(tmp_path))
    init = fs2_mod.FastSpeech2(pre, mdl, str(tmp_path)).double()
    init_sd = {k: v.numpy().copy() for k, v in init.state_dict().items()}

    our_traj, state = _jax_trajectory(batches, 2, 30000, init_sd)
    _assert_traj_match(ref_traj, our_traj, rtol=1e-5)

    # final-weights check: convert the torch end state and diff the trees
    from masg_tpu.compat.torch_fs2 import convert_torch_fastspeech2

    ref_params, _ = convert_torch_fastspeech2(
        {k: v.numpy() for k, v in ref_sd.items()},
        encoder_layers=2, decoder_layers=2)
    import jax

    flat_ref = jax.tree_util.tree_leaves_with_path(ref_params)
    flat_our = dict(jax.tree_util.tree_leaves_with_path(state.params))
    for path, ref_leaf in flat_ref:
        our_leaf = flat_our[path]
        np.testing.assert_allclose(
            np.asarray(our_leaf), np.asarray(ref_leaf), rtol=1e-6, atol=1e-9,
            err_msg=f"param {jax.tree_util.keystr(path)} diverged after "
                    f"6 microbatches / 3 updates")


def test_training_trajectory_parity_use_clf(no_dropout, tmp_path):
    """--use_clf: speaker-shuffled second forward, 150-frame chunking, frozen
    GE2E discriminator BCE with the sigmoid schedule (train.py:169-197). The
    shuffle is injected identically into both frameworks."""
    total_step = 100  # small so the sigmoid schedule weight is non-negligible
    batches = _make_batches(5, seed=2)
    ref_traj, _ = _torch_trajectory(
        batches, grad_acc_step=1, total_step=total_step, use_clf=True,
        lambd=1.0, tmpdir=str(tmp_path))

    torch.manual_seed(0)
    fs2_mod = _import_ref("fastspeech2")
    pre, mdl = _ref_configs(str(tmp_path))
    init = fs2_mod.FastSpeech2(pre, mdl, str(tmp_path)).double()
    init_sd = {k: v.numpy().copy() for k, v in init.state_dict().items()}
    net_mod = _import_ref_ge2e()
    torch.manual_seed(100)
    disc = net_mod.SpeechEmbedder().double()
    disc_sd = {k: v.detach().numpy().copy() for k, v in disc.state_dict().items()}

    our_traj, _ = _jax_trajectory(
        batches, 1, total_step, init_sd, use_clf=True, disc_sd=disc_sd,
        lambd=1.0)
    _assert_traj_match(ref_traj, our_traj, rtol=1e-5)
    assert any(r["dloss"] != 0.0 for r in ref_traj)


def _torch_ganlike_trajectory(batches, total_step, lambd, tmpdir, seed=0,
                              live_in=None, start_step=0, return_live=False,
                              disc_lstm_scale=None):
    """Replicates train_ganlike.py:140-175 + model/ganlike.py:10-45: joint
    FS2+discriminator under ONE ScheduledOptim, speaker-shuffled second
    forward, 150-frame chunking, jittered-label BCE (dloss NOT divided by
    grad_acc_step — moot at k=1), clip on FS2 params only."""
    import math

    fs2_mod = _import_ref("fastspeech2")
    loss_mod = _import_ref("loss")
    opt_mod = _import_ref("optimizer")
    net_mod = _import_ref_ge2e()
    pre, mdl = _ref_configs(tmpdir)

    if live_in is not None:
        model, disc, optim = live_in
    else:
        torch.manual_seed(seed)
        model = fs2_mod.FastSpeech2(pre, mdl, tmpdir).double()
        torch.manual_seed(seed + 100)
        disc = net_mod.SpeechEmbedder().double()
        if disc_lstm_scale is not None:
            # the UNCLIPPED ganlike discriminator's backward through 150
            # teacher frames explodes at standard LSTM init (Adam moments
            # reach ~1e17 within 2 steps — a latent reference hazard, since
            # train_ganlike.py clips model.parameters() only); scale the
            # recurrent weights into the regular regime so trajectory
            # assertions measure semantics rather than f64 chaos
            with torch.no_grad():
                for n, p in disc.named_parameters():
                    if "LSTM_stack.weight" in n:
                        p.mul_(disc_lstm_scale)
        model.train()
        disc.train()
        wrapper = torch.nn.Module()  # ScheduledOptim(ganlike): both halves
        wrapper.add_module("model", model)
        wrapper.add_module("discriminator", disc)
        train_cfg = {"optimizer": {"betas": [0.9, 0.98], "eps": EPS,
                                   "weight_decay": 0.0, "warm_up_step": WARMUP,
                                   "anneal_steps": [300000, 400000, 500000],
                                   "anneal_rate": 0.3}}
        optim = opt_mod.ScheduledOptim(wrapper, train_cfg, mdl,
                                       current_step=start_step)
    Loss = loss_mod.FastSpeech2Loss(pre, mdl)
    eLoss = loss_mod.SpeakerMetaEncLoss(pre, mdl)
    dLoss = net_mod.GE2ELoss("cpu")

    traj = []
    step = start_step + 1
    for b in batches:
        batch = (
            None, None, torch.from_numpy(b["speakers"]),
            torch.from_numpy(b["texts"]), torch.from_numpy(b["src_lens"]), L,
            torch.from_numpy(b["mels"]), torch.from_numpy(b["mel_lens"]), T,
            torch.from_numpy(b["pitches"]), torch.from_numpy(b["energies"]),
            torch.from_numpy(b["durations"]),
        )
        accents = torch.from_numpy(b["accents"])
        speaker_meta = torch.from_numpy(b["meta"])

        # === GANLike.forward (model/ganlike.py:18-45), shuffle injected ===
        output = model(*(batch[2:]), accents=accents,
                       speaker_meta=speaker_meta)
        reorder = list(b["reorder"])
        speakers = torch.stack([batch[2][reorder[i]] for i in range(B)])
        meta_sh = torch.stack([speaker_meta[reorder[i]] for i in range(B)])
        _batch = batch[:2] + (speakers,) + batch[3:]
        output2 = model(*(_batch[2:]), accents=accents, speaker_meta=meta_sh)
        max_len = output2[0].shape[1]
        max_len_r = max_len // 150 + 1
        n_mels = output2[0].shape[2]
        batch_r_m = torch.cat(
            [output2[0], torch.zeros(B, max_len_r * 150 - max_len, n_mels,
                                     dtype=output2[0].dtype)], dim=1
        ).view(B * max_len_r, 150, n_mels)
        langs = meta_sh[:, 2].view(-1, 1).repeat(1, max_len_r).view(-1)
        orig_float = torch.Tensor.float
        torch.Tensor.float = lambda self: self  # keep f64 (see use_clf test)
        try:
            output_r = disc(batch_r_m)
        finally:
            torch.Tensor.float = orig_float

        # === train_ganlike.py:145-175 ===
        losses = Loss(batch, output[:-2])
        losses[0].backward()
        eloss = eLoss(output[-1], output[-2])
        (-eloss).backward()
        langs = langs + torch.from_numpy(b["lang_jitter"])  # :163, injected
        _, _, dloss = dLoss(
            output_r.get("embeddings").view(B * max_len_r, 1, -1),
            output_r.get("da_lang_logits"), langs)
        dloss_ = dloss * (2 / (1 + math.exp(-10 * (step / total_step))) - 1) / len(langs)
        (dloss_ * lambd).backward()

        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)  # FS2 ONLY
        optim.step_and_update_lr()
        optim.zero_grad()
        traj.append({"total": float(losses[0]), "mel": float(losses[1]),
                     "postnet_mel": float(losses[2]), "pitch": float(losses[3]),
                     "energy": float(losses[4]), "duration": float(losses[5]),
                     "eloss": float(eloss), "dloss": float(dloss)})
        step += 1
    if return_live:
        return traj, model, disc, optim
    return traj


def test_training_trajectory_parity_ganlike(no_dropout, tmp_path):
    """train_ganlike.py parity: the joint FS2+discriminator update — one
    Noam Adam over both, FS2-only gradient clip, jittered-label BCE — must
    produce the same loss trajectory as our fused ganlike step."""
    import jax

    total_step = 100
    batches = _make_batches(5, seed=3)
    rng = np.random.default_rng(7)
    for b in batches:
        R = T // 150 + 1
        b["lang_jitter"] = rng.uniform(size=B * R)

    ref_traj = _torch_ganlike_trajectory(
        batches, total_step, lambd=1.0, tmpdir=str(tmp_path))

    # identical inits for conversion
    fs2_mod = _import_ref("fastspeech2")
    net_mod = _import_ref_ge2e()
    pre, mdl = _ref_configs(str(tmp_path))
    torch.manual_seed(0)
    init = fs2_mod.FastSpeech2(pre, mdl, str(tmp_path)).double()
    init_sd = {k: v.numpy().copy() for k, v in init.state_dict().items()}
    torch.manual_seed(100)
    disc0 = net_mod.SpeechEmbedder().double()
    disc_sd = {k: v.detach().numpy().copy() for k, v in disc0.state_dict().items()}

    with jax.enable_x64(True):
        import jax.numpy as jnp

        from masg_tpu.compat.torch_fs2 import convert_torch_fastspeech2
        from masg_tpu.models import FastSpeech2
        from masg_tpu.models.speaker_encoder import SpeechEmbedder
        from masg_tpu.train.loop import convert_torch_ge2e
        from masg_tpu.train.optim import make_optimizer
        from masg_tpu.train.state import TrainState
        from masg_tpu.train.step import make_ganlike_train_step

        to64 = lambda tree: jax.tree.map(
            lambda x: x.astype(np.float64)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x, tree)

        cfg = _our_config()
        params, batch_stats = convert_torch_fastspeech2(
            init_sd, encoder_layers=2, decoder_layers=2)
        model = FastSpeech2.from_config(cfg, dtype=jnp.float64)
        disc = SpeechEmbedder(n_mels=80, hidden=64, n_layers=2, proj=32,
                              dtype=jnp.float64)
        disc_params = to64(convert_torch_ge2e(disc_sd, disc))

        tx = make_optimizer(cfg.train.optimizer, 64, clip_subtree="model",
                            torch_lstm_bias_compat=True)
        state = TrainState.create(
            apply_fn=model.apply,
            params={"model": to64(params), "discriminator": disc_params},
            batch_stats=to64(batch_stats), tx=tx)
        step_fn = jax.jit(make_ganlike_train_step(
            model, disc, lambd=1.0, total_step=total_step))

        our_traj = []
        key = jax.random.PRNGKey(0)
        for b in batches:
            sb = dict(
                speakers=jnp.asarray(b["speakers"].astype(np.int32)),
                texts=jnp.asarray(b["texts"].astype(np.int32)),
                src_lens=jnp.asarray(b["src_lens"].astype(np.int32)),
                mels=jnp.asarray(b["mels"]),
                mel_lens=jnp.asarray(b["mel_lens"].astype(np.int32)),
                pitches=jnp.asarray(b["pitches"]),
                energies=jnp.asarray(b["energies"]),
                durations=jnp.asarray(b["durations"].astype(np.int32)),
                accents=jnp.asarray(b["accents"].astype(np.int32)),
                speaker_meta=jnp.asarray(b["meta"]),
                reorder=jnp.asarray(b["reorder"].astype(np.int32)),
                lang_jitter=jnp.asarray(b["lang_jitter"]),
            )
            key, sub = jax.random.split(key)
            state, m = step_fn(state, sb, sub)
            our_traj.append({"total": float(m.total), "mel": float(m.mel),
                             "postnet_mel": float(m.postnet_mel),
                             "pitch": float(m.pitch),
                             "energy": float(m.energy),
                             "duration": float(m.duration),
                             "eloss": float(m.speaker_prior),
                             "dloss": float(m.dloss)})

    _assert_traj_match(ref_traj, our_traj, rtol=1e-5)
    assert any(r["dloss"] != 0.0 for r in ref_traj)


def test_training_trajectory_parity_jdit(no_dropout, tmp_path):
    """use_jdit trajectory parity at the reference's hardcoded JDIT dims
    (encoder 256, RNNs 1024): the Tacotron2 teacher trains jointly with FS2
    under ScheduledOptim, its MSE added to the total (train.py:150-154 with
    the indexing corrected by evident intent — see _torch_trajectory), and
    its LSTM biases updating under the torch two-bias Adam compat. Two
    batches, fewer than the other variants (suite-time: the f64 jdit scan
    dominates compile and the torch python-loop decoder dominates runtime;
    two updates still catch LSTM-carry and bias-correction regressions —
    step 1 exposes init/bias-correction, step 2 exposes carried state)."""
    batches = _make_batches(2, seed=5)
    ref_traj, _ = _torch_trajectory(
        batches, grad_acc_step=1, total_step=100, tmpdir=str(tmp_path),
        use_jdit=True, hidden=256)

    torch.manual_seed(0)  # rebuild identical init for conversion
    fs2_mod = _import_ref("fastspeech2")
    pre, mdl = _ref_configs(str(tmp_path), use_jdit=True, hidden=256)
    init = fs2_mod.FastSpeech2(pre, mdl, str(tmp_path)).double()
    init_sd = {k: v.numpy().copy() for k, v in init.state_dict().items()}

    our_traj, _ = _jax_trajectory(
        batches, grad_acc_step=1, total_step=100, init_sd=init_sd,
        use_jdit=True, hidden=256)
    _assert_traj_match(ref_traj, our_traj, rtol=1e-5)


def test_mid_training_migration_round_trip(no_dropout, tmp_path):
    """Bidirectional mid-training checkpoint migration with trajectory
    continuity: 3 reference torch steps -> convert weights + BatchNorm
    running stats + Adam moments + step counts into masg_tpu -> 3 fused
    steps here -> export everything back into a reference-format checkpoint
    (export_torch_fastspeech2 / export_torch_optimizer) -> 3 more torch
    steps. The 9 segmented losses must equal a straight 9-step torch run —
    i.e. a user can move a HALF-TRAINED reference checkpoint here (or back)
    without perturbing the optimization at all."""
    batches = _make_batches(9, seed=8)
    total_step = 30000

    straight, _ = _torch_trajectory(batches, 1, total_step, tmpdir=str(tmp_path))

    # --- segment A: torch steps 1-3 ---
    seg_a, sd_a, model_t, optim_t = _torch_trajectory(
        batches[:3], 1, total_step, tmpdir=str(tmp_path), return_live=True)
    adam_sd = optim_t._optimizer.state_dict()

    # --- segment B: masg_tpu steps 4-6 from the migrated checkpoint ---
    seg_b, state = _jax_trajectory(
        batches[3:6], 1, total_step,
        init_sd={k: v.numpy().copy() for k, v in sd_a.items()},
        torch_adam_sd=adam_sd, torch_model=model_t)

    # --- migrate back: weights (+ running stats) and optimizer ---
    from masg_tpu.compat.torch_fs2 import (export_torch_fastspeech2,
                                           export_torch_optimizer)

    frag = export_torch_fastspeech2(state.params, state.batch_stats)
    msd = model_t.state_dict()
    missing = set(frag) - set(msd)
    assert not missing, f"exported keys unknown to torch: {sorted(missing)[:5]}"
    msd.update({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in frag.items()})
    model_t.load_state_dict(msd)
    optim_t._optimizer.load_state_dict(export_torch_optimizer(
        state.opt_state, model_t, betas=(0.9, 0.98), eps=EPS))
    optim_t.current_step = 6

    # --- segment C: torch steps 7-9 ---
    seg_c, _, _, _ = _torch_trajectory(
        batches[6:9], 1, total_step, tmpdir=str(tmp_path),
        live_in=(model_t, optim_t), start_step=6, return_live=True)

    _assert_traj_match(straight, seg_a + seg_b + seg_c, rtol=1e-5)


def test_ganlike_mid_training_migration_round_trip(no_dropout, tmp_path):
    """The adversarial trainer's checkpoint format {"model","discriminator",
    "optimizer"} (train_ganlike.py:247-257) also migrates both ways with
    trajectory continuity: 2 torch ganlike steps -> import (both halves'
    weights + the JOINT Adam moments over GANLike.parameters()) -> 2 fused
    steps here -> export_torch_ganlike_checkpoint -> 2 more torch steps
    reproduces a straight 6-step torch run."""
    import jax

    total_step = 100
    batches = _make_batches(6, seed=9)
    rng = np.random.default_rng(11)
    for b in batches:
        R = T // 150 + 1
        b["lang_jitter"] = rng.uniform(size=B * R)

    # disc_lstm_scale: see _torch_ganlike_trajectory — at standard init the
    # unclipped discriminator's BPTT explodes (moments ~1e17) and f64
    # reassociation noise injected at the framework switch dominates; the
    # scaled regime keeps the continuity assertion about semantics
    straight = _torch_ganlike_trajectory(batches, total_step, 1.0,
                                         str(tmp_path), disc_lstm_scale=2.0)
    # live straight run to the switch-back point: the strongest migration
    # claim is STATE equality there (weights + Adam moments), asserted below
    _, m4, d4, o4 = _torch_ganlike_trajectory(
        batches[:4], total_step, 1.0, str(tmp_path), return_live=True,
        disc_lstm_scale=2.0)
    seg_a, model_t, disc_t, optim_t = _torch_ganlike_trajectory(
        batches[:2], total_step, 1.0, str(tmp_path), return_live=True,
        disc_lstm_scale=2.0)

    sd_model = {k: v.detach().numpy().copy() for k, v in model_t.state_dict().items()}
    sd_disc = {k: v.detach().numpy().copy() for k, v in disc_t.state_dict().items()}
    adam_sd = optim_t._optimizer.state_dict()

    with jax.enable_x64(True):
        import jax.numpy as jnp

        from masg_tpu.compat.torch_fs2 import (
            convert_torch_fastspeech2, export_torch_ganlike_checkpoint,
            import_torch_ganlike_optimizer)
        from masg_tpu.models import FastSpeech2
        from masg_tpu.models.speaker_encoder import SpeechEmbedder
        from masg_tpu.train.loop import convert_torch_ge2e
        from masg_tpu.train.optim import make_optimizer
        from masg_tpu.train.state import TrainState
        from masg_tpu.train.step import make_ganlike_train_step

        to64 = lambda tree: jax.tree.map(
            lambda x: x.astype(np.float64)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x, tree)

        cfg = _our_config()
        params, batch_stats = convert_torch_fastspeech2(sd_model, 2, 2)
        model = FastSpeech2.from_config(cfg, dtype=jnp.float64)
        disc = SpeechEmbedder(n_mels=80, hidden=64, n_layers=2, proj=32,
                              dtype=jnp.float64)
        disc_params = to64(convert_torch_ge2e(sd_disc, disc))

        tx = make_optimizer(cfg.train.optimizer, 64, clip_subtree="model",
                            torch_lstm_bias_compat=True)
        state = TrainState.create(
            apply_fn=model.apply,
            params={"model": to64(params), "discriminator": disc_params},
            batch_stats=to64(batch_stats), tx=tx)
        state = state.replace(
            opt_state=import_torch_ganlike_optimizer(
                state.opt_state, adam_sd, cfg, disc),
            step=2)
        step_fn = jax.jit(make_ganlike_train_step(
            model, disc, lambd=1.0, total_step=total_step))

        seg_b = []
        key = jax.random.PRNGKey(0)
        for b in batches[2:4]:
            sb = dict(
                speakers=jnp.asarray(b["speakers"].astype(np.int32)),
                texts=jnp.asarray(b["texts"].astype(np.int32)),
                src_lens=jnp.asarray(b["src_lens"].astype(np.int32)),
                mels=jnp.asarray(b["mels"]),
                mel_lens=jnp.asarray(b["mel_lens"].astype(np.int32)),
                pitches=jnp.asarray(b["pitches"]),
                energies=jnp.asarray(b["energies"]),
                durations=jnp.asarray(b["durations"].astype(np.int32)),
                accents=jnp.asarray(b["accents"].astype(np.int32)),
                speaker_meta=jnp.asarray(b["meta"]),
                reorder=jnp.asarray(b["reorder"].astype(np.int32)),
                lang_jitter=jnp.asarray(b["lang_jitter"]),
            )
            key, sub = jax.random.split(key)
            state, m = step_fn(state, sb, sub)
            seg_b.append({"total": float(m.total), "mel": float(m.mel),
                          "postnet_mel": float(m.postnet_mel),
                          "pitch": float(m.pitch), "energy": float(m.energy),
                          "duration": float(m.duration),
                          "eloss": float(m.speaker_prior),
                          "dloss": float(m.dloss)})
        state = jax.device_get(state)
        ckpt = export_torch_ganlike_checkpoint(
            state.params, state.batch_stats, cfg, opt_state=state.opt_state,
            disc_n_layers=2)

    # --- state equality at the switch-back point vs the straight run ---
    for k, v in ckpt["model"].items():
        if k.endswith("num_batches_tracked"):
            continue  # BN bookkeeping we don't track (unused at fixed momentum)
        np.testing.assert_allclose(
            np.asarray(v, np.float64), m4.state_dict()[k].numpy(),
            atol=5e-8, err_msg=f"model.{k}")
    for k, v in ckpt["discriminator"].items():
        np.testing.assert_allclose(
            np.asarray(v, np.float64), d4.state_dict()[k].numpy(),
            atol=5e-8, err_msg=f"discriminator.{k}")
    st4 = o4._optimizer.state_dict()["state"]
    for i, entry in ckpt["optimizer"]["state"].items():
        for kk in ("exp_avg", "exp_avg_sq"):
            np.testing.assert_allclose(
                entry[kk].double().numpy(), st4[i][kk].double().numpy(),
                atol=5e-7, err_msg=f"adam[{i}].{kk}")

    msd = model_t.state_dict()
    msd.update({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in ckpt["model"].items()})
    model_t.load_state_dict(msd)
    disc_t.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in ckpt["discriminator"].items()})  # strict: full coverage
    optim_t._optimizer.load_state_dict(ckpt["optimizer"])
    optim_t.current_step = 4

    seg_c = _torch_ganlike_trajectory(
        batches[4:6], total_step, 1.0, str(tmp_path),
        live_in=(model_t, disc_t, optim_t), start_step=4)

    merged = seg_a + seg_b + seg_c
    _assert_traj_match(straight, merged, rtol=1e-5,
                       keys=["total", "mel", "postnet_mel", "pitch",
                             "energy", "duration", "eloss"])
    # dloss flows through the discriminator's 150-frame BPTT, which
    # amplifies the ~1e-9 f64 reassociation noise injected at the framework
    # switch by ~1e5/step (the FS2 losses above have no such recurrence);
    # the switch-point STATE equality asserted above is the exact claim
    _assert_traj_match(straight, merged, rtol=3e-2, keys=["dloss"])
