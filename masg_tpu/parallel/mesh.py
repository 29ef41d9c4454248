"""Device mesh + sharding rules.

The reference's distributed story is single-host nn.DataParallel plus NCCL DDP
in the GE2E trainer (SURVEY §2.8). The TPU-native equivalent is a single
(data, model) jax.sharding.Mesh:

- batch arrays shard over 'data' (gradient psum rides ICI, inserted by XLA);
- the Megatron-style tensor-parallel axis 'model' shards the FFN inner dim and
  the attention head projections (column-parallel in, row-parallel out) — not
  required for parity at 35M params, but the rules below make the full train
  step runnable at tp > 1 for scale-out;
- multi-host expansion is jax.distributed.initialize + the same mesh over DCN.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_size(batch_size: int, n_devices: int) -> int:
    """Largest device count <= n_devices that divides batch_size evenly, so
    every full batch shards cleanly over the 'data' axis."""
    n = max(min(batch_size, n_devices), 1)
    while batch_size % n != 0:
        n -= 1
    return n


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


# parameter-path regex -> PartitionSpec over ('data', 'model') mesh axes.
# flax Dense kernels are (in, out); Conv kernels are (window, in, out).
_PARAM_RULES = [
    # FFN: column-parallel first conv (shard inner dim), row-parallel second
    (re.compile(r".*pos_ffn.*w_1.*kernel"), P(None, None, "model")),
    (re.compile(r".*pos_ffn.*w_1.*bias"), P("model")),
    (re.compile(r".*pos_ffn.*w_2.*kernel"), P(None, "model", None)),
    # attention: shard projected head dim; fc contracts over it
    (re.compile(r".*slf_attn.*w_[qkv]s.*kernel"), P(None, "model")),
    (re.compile(r".*slf_attn.*w_[qkv]s.*bias"), P("model")),
    (re.compile(r".*slf_attn.*fc.*kernel"), P("model", None)),
    # postnet inner convs (512 channels)
    (re.compile(r".*postnet.*conv_[0-3].*kernel"), P(None, None, "model")),
]


def param_pspec(path: str, value) -> P:
    for rule, spec in _PARAM_RULES:
        if rule.match(path):
            # only shard when the annotated dim divides evenly; checked by caller
            return spec
    return P()


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def place_global(x, mesh: Mesh, spec: P):
    """Place one array with a NamedSharding, multi-process safe.

    Single-process: plain device_put. Multi-process (jax.distributed over
    DCN / gloo): the mesh spans non-addressable devices, so build the global
    jax.Array from each process's identical host copy via
    make_array_from_callback — every process materializes only its
    addressable shards."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place every param with its rule's NamedSharding (replicated
    fallback; dims that don't divide the mesh axis stay replicated)."""
    n_model = mesh.shape["model"]

    def place(path, x):
        spec = param_pspec(_path_str(path), x)
        # validate divisibility; fall back to replication otherwise
        ok = True
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis] if isinstance(axis, str) else 1
            if dim >= x.ndim or x.shape[dim] % size != 0:
                ok = False
        if not ok or n_model == 1:
            spec = P()
        return place_global(x, mesh, spec)

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard leading (batch) dim of every array over the 'data' axis."""

    def place(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return place_global(x, mesh, spec)

    return jax.tree.map(place, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda x: place_global(x, mesh, P()), tree)
