"""MelGAN generator (descriptinc/melgan-neurips architecture) for mel -> wav.

Reference: utils/model.py:46-56 loads this model via
`torch.hub.load("descriptinc/melgan-neurips", "load_melgan", ...)` and feeds
it natural-log mels divided by ln(10) (utils/model.py:76-78: the descript
checkpoints were trained on log10 mels). torch.hub needs network egress, so
this is a first-party implementation of the same generator with a torch
state-dict converter — a local checkpoint gives the identical waveform
(tests/test_melgan.py).

Architecture (descript mel2wav/modules.py, defaults ngf=32, 3 residual
layers, ratios 8,8,2,2): reflection-padded 7-tap conv to 512 ch, then per
ratio [leaky_relu -> ConvTranspose1d(k=2r, stride=r, pad=r//2+r%2) -> 3x
dilated residual blocks (3^j dilation, 1x1 shortcut)], final leaky_relu +
reflection-padded 7-tap conv to 1 ch + tanh. All convs weight-normed (folded
into kernels at conversion).

TPU design: channel-last layout, transposed conv as lhs-dilated conv (shared
helpers from models/hifigan.py), whole graph jit-compiled.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .hifigan import conv1d, conv_transpose1d

LRELU_SLOPE = 0.2


def _reflect_pad_time(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class MelGANGenerator(nn.Module):
    n_mels: int = 80
    ngf: int = 32
    n_residual_layers: int = 3
    ratios: Tuple[int, ...] = (8, 8, 2, 2)
    dtype: jnp.dtype = jnp.float32

    def _conv(self, name, k, cin, cout):
        w = self.param(f"{name}_kernel", nn.initializers.normal(0.02),
                       (k, cin, cout), self.dtype)
        b = self.param(f"{name}_bias", nn.initializers.zeros, (cout,), self.dtype)
        return w, b

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel: (B, T, n_mels) log10-scaled -> wav (B, T * prod(ratios))."""
        mult = 2 ** len(self.ratios)
        ch = mult * self.ngf

        w, b = self._conv("conv_pre", 7, self.n_mels, ch)
        x = conv1d(_reflect_pad_time(mel, 3), w, b, padding=0)

        for i, r in enumerate(self.ratios):
            out_ch = ch // 2
            x = nn.leaky_relu(x, LRELU_SLOPE)
            wu, bu = self._conv(f"ups_{i}", 2 * r, ch, out_ch)
            x = conv_transpose1d(x, wu, bu, stride=r, padding=r // 2 + r % 2)
            for j in range(self.n_residual_layers):
                d = 3 ** j
                h = nn.leaky_relu(x, LRELU_SLOPE)
                w1, b1 = self._conv(f"res_{i}_{j}_conv1", 3, out_ch, out_ch)
                h = conv1d(_reflect_pad_time(h, d), w1, b1, padding=0, dilation=d)
                h = nn.leaky_relu(h, LRELU_SLOPE)
                w2, b2 = self._conv(f"res_{i}_{j}_conv2", 1, out_ch, out_ch)
                h = conv1d(h, w2, b2, padding=0)
                ws, bs = self._conv(f"res_{i}_{j}_shortcut", 1, out_ch, out_ch)
                x = conv1d(x, ws, bs, padding=0) + h
            ch = out_ch

        x = nn.leaky_relu(x, LRELU_SLOPE)
        wp, bp = self._conv("conv_post", 7, ch, 1)
        x = conv1d(_reflect_pad_time(x, 3), wp, bp, padding=0)
        return jnp.tanh(x)[..., 0]


def convert_torch_state_dict(state_dict, ngf: int = 32, n_residual_layers: int = 3,
                             ratios: Tuple[int, ...] = (8, 8, 2, 2)) -> dict:
    """descript MelGAN generator state_dict -> MelGANGenerator params.

    Keys follow the torch nn.Sequential layout (`model.<idx>....`, indices
    derived from the published module order); weight norm (weight_g/weight_v)
    is folded; torch Conv1d (out, in, k) / ConvTranspose1d (in, out, k)
    kernels transpose to flax (k, in, out)."""
    sd = {k.split("mel2wav.", 1)[-1]: np.asarray(v) for k, v in state_dict.items()}

    def fold(prefix):
        if prefix + ".weight" in sd:
            w = sd[prefix + ".weight"]
        else:
            v = sd[prefix + ".weight_v"]
            g = sd[prefix + ".weight_g"]
            norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
            w = g * v / norm
        return w, sd[prefix + ".bias"]

    params = {}

    def put(name, prefix, transpose=False):
        w, b = fold(prefix)
        w = np.transpose(w, (2, 0, 1) if transpose else (2, 1, 0))
        params[name + "_kernel"] = w
        params[name + "_bias"] = b

    put("conv_pre", "model.1")
    idx = 2
    for i in range(len(ratios)):
        idx += 1  # skip LeakyReLU
        put(f"ups_{i}", f"model.{idx}", transpose=True)
        idx += 1
        for j in range(n_residual_layers):
            put(f"res_{i}_{j}_conv1", f"model.{idx}.block.2")
            put(f"res_{i}_{j}_conv2", f"model.{idx}.block.4")
            put(f"res_{i}_{j}_shortcut", f"model.{idx}.shortcut")
            idx += 1
    idx += 2  # LeakyReLU + ReflectionPad
    put("conv_post", f"model.{idx}")
    return params
