"""Pin down the uniform 6.9e-7 scalar divergence in update 1.

Prints: torch global grad norm + applied lr; our global norm + schedule lr;
and the elementwise ratio (d_our/d_ref) distribution for one tensor.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import torch

from test_torch_train_parity import (_import_ref, _make_batches, _ref_configs,
                                     _our_config, WARMUP, EPS, B, L)

import tempfile

torch.nn.functional.dropout = lambda x, p=0.5, training=False, inplace=False: x
import flax.linen as fnn
_orig = fnn.Dropout.__call__
fnn.Dropout.__call__ = lambda self, x, deterministic=None, rng=None: _orig(
    self, x, deterministic=True)

tmpdir = tempfile.mkdtemp()
b = _make_batches(1, seed=1)[0]

fs2_mod = _import_ref("fastspeech2")
loss_mod = _import_ref("loss")
opt_mod = _import_ref("optimizer")
pre, mdl = _ref_configs(tmpdir)
torch.manual_seed(0)
model = fs2_mod.FastSpeech2(pre, mdl, tmpdir).double()
model.train()
init_sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}
Loss = loss_mod.FastSpeech2Loss(pre, mdl)
eLoss = loss_mod.SpeakerMetaEncLoss(pre, mdl)
train_cfg = {"optimizer": {"betas": [0.9, 0.98], "eps": EPS,
                           "weight_decay": 0.0, "warm_up_step": WARMUP,
                           "anneal_steps": [300000, 400000, 500000],
                           "anneal_rate": 0.3}}
optim = opt_mod.ScheduledOptim(model, train_cfg, mdl, current_step=0)

batch = (
    None, None, torch.from_numpy(b["speakers"]),
    torch.from_numpy(b["texts"]), torch.from_numpy(b["src_lens"]), L,
    torch.from_numpy(b["mels"]), torch.from_numpy(b["mel_lens"]),
    int(b["mels"].shape[1]),
    torch.from_numpy(b["pitches"]), torch.from_numpy(b["energies"]),
    torch.from_numpy(b["durations"]),
)
output = model(*(batch[2:]), accents=torch.from_numpy(b["accents"]),
               speaker_meta=torch.from_numpy(b["meta"]))
losses = Loss(batch, output[:-2])
losses[0].backward()
eloss = eLoss(output[-1], output[-2])
(-eloss).backward()
tnorm = torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
print(f"torch grad norm: {float(tnorm):.15f}")
print(f"torch clip coef: {1.0/(float(tnorm)+1e-6):.15f} "
      f"(no-fudge {1.0/float(tnorm):.15f})")
optim.step_and_update_lr()
print(f"torch applied lr: {optim._optimizer.param_groups[0]['lr']:.18e}")
ref_sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}

import jax

with jax.enable_x64(True):
    import jax.numpy as jnp

    from masg_tpu.compat.torch_fs2 import convert_torch_fastspeech2
    from masg_tpu.models import FastSpeech2
    from masg_tpu.train.optim import make_optimizer, noam_schedule
    from masg_tpu.train.state import create_train_state
    from masg_tpu.train.step import make_train_step, optax_global_norm

    cfg = _our_config(1)
    params, batch_stats = convert_torch_fastspeech2(
        init_sd, encoder_layers=2, decoder_layers=2)
    to64 = lambda tree: jax.tree.map(
        lambda x: x.astype(np.float64)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else x, tree)
    params, batch_stats = to64(params), to64(batch_stats)
    jmodel = FastSpeech2.from_config(cfg, dtype=jnp.float64)
    tx = make_optimizer(cfg.train.optimizer, 64)
    state = create_train_state(
        jmodel, {"params": params, "batch_stats": batch_stats}, tx)
    step_fn = make_train_step(jmodel)

    sched = noam_schedule(64, cfg.train.optimizer.warm_up_step,
                          cfg.train.optimizer.anneal_steps,
                          cfg.train.optimizer.anneal_rate)
    print(f"our schedule lr at count=0: {float(sched(0)):.18e}")

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
    grads, _aux = jax.jit(jax.grad(step_fn.loss_fn, has_aux=True))(
        params, batch_stats, sb, jax.random.PRNGKey(0), jnp.asarray(0.0))
    print(f"our grad norm: {float(optax_global_norm(grads)):.15f}")
    state2, _m = jax.jit(step_fn)(state, sb, jax.random.PRNGKey(0))
    our_params = jax.device_get(state2.params)

ref_params, _ = convert_torch_fastspeech2(ref_sd, encoder_layers=2,
                                          decoder_layers=2)
init_params, _ = convert_torch_fastspeech2(init_sd, encoder_layers=2,
                                           decoder_layers=2)
fr = dict(jax.tree_util.tree_leaves_with_path(ref_params))
fi = dict(jax.tree_util.tree_leaves_with_path(init_params))
fo = dict(jax.tree_util.tree_leaves_with_path(our_params))
for name in ["['mel_linear']['kernel']", "['postnet']['conv_0']['kernel']"]:
    for path in fr:
        if jax.tree_util.keystr(path) == name:
            d_ref = (np.asarray(fr[path], np.float64) -
                     np.asarray(fi[path], np.float64)).ravel()
            d_our = (np.asarray(fo[path], np.float64) -
                     np.asarray(fi[path], np.float64)).ravel()
            ratio = d_our / d_ref
            print(f"{name}: ratio mean={ratio.mean():.12f} "
                  f"std={ratio.std():.3e} min={ratio.min():.12f} "
                  f"max={ratio.max():.12f}")
