"""Sinusoidal positional encodings.

Numerically identical to the reference's table (transformer/Models.py:10-30):
angle(pos, i) = pos / 10000^(2*(i//2)/d); even dims take sin, odd dims cos.

Because the table is a pure function of (position, dim) we compute it on the
fly for any static length instead of storing a fixed-size buffer — this makes
the reference's two code paths (table lookup for T <= max_seq_len, on-the-fly
regeneration for longer inference inputs, Models.py:86-103) collapse into one.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _sinusoid_table_np(n_position: int, d_hid: int) -> np.ndarray:
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    dim = np.arange(d_hid, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2.0 * (dim // 2) / d_hid)
    table = np.empty((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


def sinusoid_table(n_position: int, d_hid: int, dtype=jnp.float32) -> jnp.ndarray:
    """(n_position, d_hid) sinusoid encoding table (static shapes only)."""
    return jnp.asarray(_sinusoid_table_np(int(n_position), int(d_hid)), dtype=dtype)
