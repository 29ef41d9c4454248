"""Locate the residual torch-vs-jax divergence in the update math.

Runs ONE batch / one update in f64 in both frameworks from identical weights,
then diffs (a) the loss to machine precision, (b) the per-parameter weight
DELTAS. A uniform relative delta error points at the lr/clip scalar; a
localized one points at that module's gradient.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import torch

from test_torch_train_parity import (
    _import_ref, _make_batches, _ref_configs, _torch_trajectory,
    _jax_trajectory, WARMUP, B, L)

import tempfile

# disable dropout like the fixture does
torch.nn.functional.dropout = lambda x, p=0.5, training=False, inplace=False: x
import flax.linen as fnn
_orig = fnn.Dropout.__call__
fnn.Dropout.__call__ = lambda self, x, deterministic=None, rng=None: _orig(
    self, x, deterministic=True)

tmpdir = tempfile.mkdtemp()
batches = _make_batches(int(os.environ.get("N_BATCHES", "2")), seed=1)

ref_traj, ref_sd = _torch_trajectory(batches, grad_acc_step=1,
                                     total_step=30000, tmpdir=tmpdir)

torch.manual_seed(0)
fs2_mod = _import_ref("fastspeech2")
pre, mdl = _ref_configs(tmpdir)
init = fs2_mod.FastSpeech2(pre, mdl, tmpdir).double()
init_sd = {k: v.numpy().copy() for k, v in init.state_dict().items()}

our_traj, state = _jax_trajectory(batches, 1, 30000, init_sd)

for i, (r, o) in enumerate(zip(ref_traj, our_traj)):
    for k in r:
        d = abs(r[k] - o[k])
        rel = d / max(abs(r[k]), 1e-12)
        flag = " <<<" if rel > 1e-9 else ""
        print(f"step{i+1} {k}: torch={r[k]:.12f} jax={o[k]:.12f} rel={rel:.2e}{flag}")

from masg_tpu.compat.torch_fs2 import convert_torch_fastspeech2
import jax

ref_params, _ = convert_torch_fastspeech2(
    {k: v.numpy() for k, v in ref_sd.items()}, encoder_layers=2,
    decoder_layers=2)
init_params, _ = convert_torch_fastspeech2(init_sd, encoder_layers=2,
                                           decoder_layers=2)

flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_params))
flat_init = dict(jax.tree_util.tree_leaves_with_path(init_params))
flat_our = dict(jax.tree_util.tree_leaves_with_path(state.params))

rows = []
for path, ref_leaf in flat_ref.items():
    our_leaf = np.asarray(flat_our[path], np.float64)
    ref_leaf = np.asarray(ref_leaf, np.float64)
    d_ref = ref_leaf - np.asarray(flat_init[path], np.float64)
    d_our = our_leaf - np.asarray(flat_init[path], np.float64)
    dd = np.abs(d_ref - d_our)
    scale = np.abs(d_ref).max() + 1e-30
    rows.append((dd.max() / scale, dd.max(), np.abs(d_ref).max(),
                 jax.tree_util.keystr(path)))
rows.sort(reverse=True)
print("\ndelta-relative-err  |d_ref-d_our|max  |d_ref|max  param")
for rel, dmax, rmax, name in rows[:25]:
    print(f"{rel:.3e}  {dmax:.3e}  {rmax:.3e}  {name}")
print("...")
for rel, dmax, rmax, name in rows[-5:]:
    print(f"{rel:.3e}  {dmax:.3e}  {rmax:.3e}  {name}")
