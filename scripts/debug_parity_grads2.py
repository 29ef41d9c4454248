"""Compare STEP-1 GRADIENTS torch-vs-jax in f64 from identical weights.

The forward/losses agree to 1e-15 but weight deltas after one update differ
at ~1e-5 relative on some kernels — this isolates whether the backward pass
itself computes different gradients (semantic) or the optimizer amplifies
rounding (chaos). Gradients transform like weights under the linear
torch->flax conversion, so the torch grad state_dict rides the same
converter.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import torch

from test_torch_train_parity import (_import_ref, _make_batches, _ref_configs,
                                     _our_config, B, L)

import tempfile

torch.nn.functional.dropout = lambda x, p=0.5, training=False, inplace=False: x
import flax.linen as fnn
_orig = fnn.Dropout.__call__
fnn.Dropout.__call__ = lambda self, x, deterministic=None, rng=None: _orig(
    self, x, deterministic=True)

tmpdir = tempfile.mkdtemp()
b = _make_batches(1, seed=1)[0]

# ---- torch gradients ----
fs2_mod = _import_ref("fastspeech2")
loss_mod = _import_ref("loss")
pre, mdl = _ref_configs(tmpdir)
torch.manual_seed(0)
model = fs2_mod.FastSpeech2(pre, mdl, tmpdir).double()
model.train()
init_sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}
Loss = loss_mod.FastSpeech2Loss(pre, mdl)
eLoss = loss_mod.SpeakerMetaEncLoss(pre, mdl)

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
grad_sd = {k: (p.grad.numpy().copy() if p.grad is not None else
               np.zeros_like(p.detach().numpy()))
           for k, p in model.named_parameters()}
# buffers (BN running stats) have no grads; fill zeros so converter is happy
for k, v in model.state_dict().items():
    if k not in grad_sd:
        grad_sd[k] = np.zeros_like(np.asarray(v))

# ---- jax gradients ----
import jax

with jax.enable_x64(True):
    import jax.numpy as jnp

    from masg_tpu.compat.torch_fs2 import convert_torch_fastspeech2
    from masg_tpu.models import FastSpeech2
    from masg_tpu.train.step import make_train_step

    cfg = _our_config(1)
    params, batch_stats = convert_torch_fastspeech2(
        init_sd, encoder_layers=2, decoder_layers=2)
    to64 = lambda tree: jax.tree.map(
        lambda x: x.astype(np.float64)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else x, tree)
    params, batch_stats = to64(params), to64(batch_stats)
    jmodel = FastSpeech2.from_config(cfg, dtype=jnp.float64)
    step_fn = make_train_step(jmodel)

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
    jgrads, _aux = jax.jit(jax.grad(step_fn.loss_fn, has_aux=True))(
        params, batch_stats, sb, jax.random.PRNGKey(0), jnp.asarray(0.0))
    jgrads = jax.device_get(jgrads)

ref_grads, _ = convert_torch_fastspeech2(grad_sd, encoder_layers=2,
                                         decoder_layers=2)

flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_grads))
flat_our = dict(jax.tree_util.tree_leaves_with_path(jgrads))
rows = []
for path, rg in flat_ref.items():
    og = np.asarray(flat_our[path], np.float64)
    rg = np.asarray(rg, np.float64)
    d = np.abs(rg - og)
    scale = np.abs(rg).max() + 1e-30
    i = np.unravel_index(np.argmax(d), d.shape) if d.size else ()
    rows.append((d.max() / scale, d.max(), np.abs(rg).max(),
                 rg[i] if d.size else 0.0, og[i] if d.size else 0.0,
                 jax.tree_util.keystr(path)))
rows.sort(reverse=True)
print("rel-err  |dg|max  |g_ref|max  g_ref@argmax  g_jax@argmax  param")
for rel, dmax, gmax, gr, go, name in rows[:20]:
    print(f"{rel:.3e}  {dmax:.3e}  {gmax:.3e}  {gr:+.6e}  {go:+.6e}  {name}")
