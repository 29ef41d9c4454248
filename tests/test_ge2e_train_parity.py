"""GE2E trainer update-math parity vs the reference's torch trainer.

Replicates /root/reference/Multilingual-Speaker-Encoder-with-Domain-
Adaptation/train_speech_embedder.py:115-248 exactly — per-group torch Adam
(main lr wd=1e-6 clip 3.0 / ge2e lr clip 1.0 / da 1e-3 wd=1e-6 clip 3.0),
the per-BATCH da gate `da_loss < threshold or progress <= da_startpoint`,
gate-scoped backward (da_loss only backprops when the gate is on; with
set_to_none grads the skipped groups' Adam moments stay frozen), and the
per-epoch DA subroutine (:249-288) that REUSES the main loop's da optimizer
state — and asserts our fused jitted step + run_da_subroutine reproduce the
loss trajectories.

The LSTM two-bias quirk (torch bias_ih/bias_hh vs our folded single bias) is
exact here because the reference zero-inits every LSTM bias
(speech_embedder_net.py:74-77): both biases stay equal forever, so doubling
the folded Adam update (train/optim.py double_lstm_bias_updates) matches the
sum of the two torch updates including the 1e-6 L2 term.

Dropout is disabled on both sides (the DA head's 0.2 dropout is the only
stochastic node; reference speech_embedder_net.py:145 Classifier).
"""

import importlib
import math
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_GE2E = "/root/reference/Multilingual-Speaker-Encoder-with-Domain-Adaptation"

N, M = 3, 2
NMELS = 20
T_FRAMES = 24
HIDDEN, LAYERS, PROJ = 32, 2, 16
LR = 1e-3


class _Dot(dict):
    __getattr__ = dict.__getitem__


def _hp():
    return _Dot(
        data=_Dot(nmels=NMELS, tisv_frame=T_FRAMES, sr=22050, hop=256,
                  window=1024, nfft=1024),
        model=_Dot(architecture="LSTM", hidden=HIDDEN, num_layer=LAYERS,
                   proj=PROJ, da=True, da_on="language", da_startpoint=0.0,
                   loss="softmax"),
        train=_Dot(N=N, M=M),
    )


def _import_ref_full():
    """Reference speech_embedder_net + the REAL utils module (its GE2E
    similarity/softmax math matters for this test, unlike the ganlike-parity
    stubs). utils.py imports librosa at module scope but never uses it in the
    loss path — stub the import (librosa is absent from this image)."""
    import importlib.util
    if "librosa" not in sys.modules and importlib.util.find_spec("librosa") is None:
        sys.modules["librosa"] = types.ModuleType("librosa")
    alias = f"refge2e_full_{HIDDEN}x{LAYERS}p{PROJ}"
    if alias not in sys.modules:
        pkg = types.ModuleType(alias)
        pkg.__path__ = [REF_GE2E]
        sys.modules[alias] = pkg
        hparam_mod = types.ModuleType(f"{alias}.hparam")
        hparam_mod.hparam = _hp()
        sys.modules[f"{alias}.hparam"] = hparam_mod
    net = importlib.import_module(f"{alias}.speech_embedder_net")
    return net


@pytest.fixture
def no_dropout(monkeypatch):
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


def _make_batches(n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        mels = rng.normal(size=(N * M, T_FRAMES, NMELS)).astype(np.float64)
        langs = (np.arange(N) % 2).repeat(M).astype(np.float64)
        out.append((mels, langs))
    return out


def _keep_f64():
    """compute_embedding/forward call x.float() (speech_embedder_net.py:109);
    neutralize so the torch side stays double for tight comparison."""
    orig = torch.Tensor.float
    torch.Tensor.float = lambda self: self
    return orig


def _torch_trajectory(batches, progresses, use_ge2e_backward, threshold,
                      da_startpoint=0.0, subroutine_after=None,
                      sub_stream=None, seed=0, anneal_after=()):
    """The reference loop verbatim: zero_grad (set_to_none -> skipped groups'
    Adam moments freeze), gated backwards, per-group clips + steps
    (train_speech_embedder.py:169-192), optional da_classifier_subroutine
    after step index `subroutine_after` sharing optimizers['da'] (:214)."""
    net_mod = _import_ref_full()
    torch.manual_seed(seed)
    net = net_mod.SpeechEmbedder().double()
    ge2e = net_mod.GE2ELoss("cpu").double()
    net.train()

    opt_main = torch.optim.Adam(net.main_parameters(), lr=LR, weight_decay=1e-6)
    opt_ge2e = torch.optim.Adam(ge2e.parameters(), lr=LR)
    opt_da = torch.optim.Adam(net.da_parameters(), lr=1e-3, weight_decay=1e-6)

    orig_float = _keep_f64()
    traj, gates = [], []
    try:
        for i, ((mels, langs), progress) in enumerate(zip(batches, progresses)):
            for o in (opt_main, opt_ge2e, opt_da):
                o.zero_grad()
            out = net(torch.from_numpy(mels))
            emb = out["embeddings"].view(N, M, -1)
            _, loss, da_loss = ge2e(emb, out["da_lang_logits"],
                                    torch.from_numpy(langs))
            gate = bool(da_loss < threshold) or (progress <= da_startpoint)
            if use_ge2e_backward:
                loss.backward(retain_graph=gate)
            if gate:
                da_loss.backward()
            torch.nn.utils.clip_grad_norm_(net.main_parameters(), 3.0)
            torch.nn.utils.clip_grad_norm_(ge2e.parameters(), 1.0)
            opt_main.step()
            opt_ge2e.step()
            if gate:
                torch.nn.utils.clip_grad_norm_(net.da_parameters(), 3.0)
                opt_da.step()
            traj.append({"loss": float(loss), "da": float(da_loss)})
            gates.append(gate)

            if i in anneal_after:
                # reference lr_schedule (:83-94): halve main+ge2e lr at
                # epoch end; da lr never anneals
                for o in (opt_main, opt_ge2e):
                    for pg in o.param_groups:
                        pg["lr"] = pg["lr"] / 2

            if subroutine_after is not None and i == subroutine_after:
                for s_mels, s_langs in sub_stream:
                    opt_da.zero_grad()
                    s_out = net(torch.from_numpy(s_mels), detach=True)
                    s_da = torch.nn.BCEWithLogitsLoss(reduction="sum")(
                        s_out["da_lang_logits"], torch.from_numpy(s_langs))
                    s_da.backward()
                    torch.nn.utils.clip_grad_norm_(net.da_parameters(), 3.0)
                    opt_da.step()
                    traj.append({"loss": 0.0, "da": float(s_da)})
    finally:
        torch.Tensor.float = orig_float
    return traj, gates


def _our_trajectory(batches, progresses, use_ge2e_backward, threshold,
                    torch_seed=0, da_startpoint=0.0, subroutine_after=None,
                    sub_stream=None, anneal_after=()):
    import jax

    with jax.enable_x64(True):
        import jax.numpy as jnp

        from masg_tpu.models.speaker_encoder import SpeechEmbedder
        from masg_tpu.train.ge2e import (GE2ETrainState, _split_da,
                                         make_da_subroutine_step,
                                         make_ge2e_train_step)
        from masg_tpu.train.loop import convert_torch_ge2e

        net_mod = _import_ref_full()
        torch.manual_seed(torch_seed)
        ref_net = net_mod.SpeechEmbedder().double()
        ref_ge2e = net_mod.GE2ELoss("cpu").double()
        sd = {k: v.detach().numpy().copy() for k, v in ref_net.state_dict().items()}

        embedder = SpeechEmbedder(n_mels=NMELS, hidden=HIDDEN, n_layers=LAYERS,
                                  proj=PROJ, dtype=jnp.float64)
        params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float64), convert_torch_ge2e(sd, embedder))

        init_state, step = make_ge2e_train_step(
            embedder, N, M, lr=LR, use_ge2e_backward=use_ge2e_backward,
            da_threshold=threshold)
        state = init_state(jax.random.PRNGKey(0), batches[0][0])
        ge2e0 = state.ge2e._replace(
            w=jnp.asarray(float(ref_ge2e.w), jnp.float64),
            b=jnp.asarray(float(ref_ge2e.b), jnp.float64))
        # opt-state moments were initialized from the embedder's own f32
        # init — promote everything to f64 (zeros stay zeros) to match the
        # converted torch params
        to64 = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        state = GE2ETrainState(params, ge2e0, to64(state.opt_state_main),
                               to64(state.opt_state_ge2e),
                               to64(state.opt_state_da))

        traj = []
        key = jax.random.PRNGKey(1)
        lr_scale = 1.0
        for i, ((mels, langs), progress) in enumerate(zip(batches, progresses)):
            key, sub = jax.random.split(key)
            pretrain = progress <= da_startpoint  # host-side f64, as trainer
            state, loss, da = step(state, jnp.asarray(mels),
                                   jnp.asarray(langs), sub,
                                   jnp.asarray(pretrain),
                                   jnp.asarray(lr_scale, jnp.float64))
            traj.append({"loss": float(loss), "da": float(da)})
            if i in anneal_after:
                lr_scale /= 2

            if subroutine_after is not None and i == subroutine_after:
                _, sub_step, _burst = make_da_subroutine_step(embedder)
                p_main, p_da = _split_da(state.embedder_params)
                opt_da = state.opt_state_da
                for s_mels, s_langs in sub_stream:
                    key, sub2 = jax.random.split(key)
                    p_da, opt_da, s_loss = sub_step(
                        p_da, opt_da, p_main, jnp.asarray(s_mels),
                        jnp.asarray(s_langs), sub2)
                    traj.append({"loss": 0.0, "da": float(s_loss)})
                state = state._replace(
                    embedder_params={**p_main, **p_da}, opt_state_da=opt_da)
        return traj


def _assert_match(ref, ours, rtol=1e-6):
    for i, (r, o) in enumerate(zip(ref, ours)):
        for k in ("loss", "da"):
            np.testing.assert_allclose(
                o[k], r[k], rtol=rtol, atol=1e-9,
                err_msg=f"step {i} '{k}': torch={r[k]:.8f} jax={o[k]:.8f}")


def test_ge2e_trajectory_always_gated(no_dropout):
    """Gate always on (threshold=inf): every group steps every batch."""
    batches = _make_batches(6, seed=1)
    progresses = [0.5] * 6
    ref, gates = _torch_trajectory(batches, progresses, True, math.inf)
    ours = _our_trajectory(batches, progresses, True, math.inf)
    assert all(gates)
    _assert_match(ref, ours)


def test_ge2e_trajectory_gate_toggles(no_dropout):
    """Threshold chosen so the per-batch gate flips mid-run: da_loss only
    backprops into the trunk on gated batches, and the da group's Adam
    moments freeze on skipped ones (train_speech_embedder.py:182-192)."""
    batches = _make_batches(8, seed=2)
    progresses = [0.5] * 8
    ref, _ = _torch_trajectory(batches, progresses, True, math.inf)
    # pick a threshold strictly between observed da values so both branches
    # are exercised deterministically
    das = sorted(r["da"] for r in ref)
    thr = (das[len(das) // 2 - 1] + das[len(das) // 2]) / 2
    ref, gates = _torch_trajectory(batches, progresses, True, thr)
    assert any(gates) and not all(gates), f"gate never toggled (thr={thr})"
    ours = _our_trajectory(batches, progresses, True, thr)
    _assert_match(ref, ours)


def test_ge2e_trajectory_ablation_no_ge2e_backward(no_dropout):
    """The shipped snapshot's sg_discriminator_woGE2E ablation: GE2E backward
    commented out (train_speech_embedder.py:181) — main/ge2e groups receive
    grads ONLY via the gated da_loss; on gate-off batches torch's set_to_none
    zero_grad leaves them None and Adam skips them entirely."""
    batches = _make_batches(8, seed=3)
    progresses = [0.5] * 8
    ref, _ = _torch_trajectory(batches, progresses, False, math.inf)
    das = sorted(r["da"] for r in ref)
    thr = (das[len(das) // 2 - 1] + das[len(das) // 2]) / 2
    ref, gates = _torch_trajectory(batches, progresses, False, thr)
    assert any(gates) and not all(gates)
    ours = _our_trajectory(batches, progresses, False, thr)
    _assert_match(ref, ours)


def test_ge2e_da_subroutine_shares_optimizer_state(no_dropout):
    """The per-epoch DA subroutine receives optimizers['da']
    (train_speech_embedder.py:214) — its Adam moments carry over from and
    back into the main loop. Run main steps, a subroutine burst, then more
    main steps; any fresh-optimizer shortcut diverges after the burst."""
    batches = _make_batches(6, seed=4)
    sub_stream = [(m, l) for m, l in _make_batches(3, seed=40)]
    progresses = [0.5] * 6
    ref, gates = _torch_trajectory(
        batches, progresses, True, math.inf,
        subroutine_after=2, sub_stream=sub_stream)
    assert all(gates)
    ours = _our_trajectory(
        batches, progresses, True, math.inf,
        subroutine_after=2, sub_stream=sub_stream)
    _assert_match(ref, ours)


def test_ge2e_trajectory_lr_anneal(no_dropout):
    """The reference halves the main and ge2e learning rates at epoch ends
    (lr_schedule, train_speech_embedder.py:83-94,207; anneal_epochs in its
    config) while the da group's lr stays fixed — the step's lr_scale input
    must reproduce the trajectory across an anneal boundary."""
    batches = _make_batches(6, seed=6)
    progresses = [0.5] * 6
    ref, gates = _torch_trajectory(batches, progresses, True, math.inf,
                                   anneal_after=(2,))
    assert all(gates)
    ours = _our_trajectory(batches, progresses, True, math.inf,
                           anneal_after=(2,))
    _assert_match(ref, ours)
