"""HiFi-GAN generator (V1) for mel -> waveform synthesis.

Reference: hifigan/models.py:20-174 + hifigan/config.json (universal V1:
upsample rates [8,8,2,2], kernels [16,16,4,4], 512 initial channels, MRF
resblock kernels [3,7,11] with dilations (1,3,5)).

TPU design: channel-last (B, T, C) layout throughout; the torch
ConvTranspose1d is expressed as an input-dilated regular convolution
(lhs_dilation=stride, pad k-1-p) which is bit-equivalent to torch's
gradient-of-conv semantics — so converted torch checkpoints reproduce the
same waveform. Weight norm is folded into the kernels at load time (the
reference calls remove_weight_norm for inference).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, padding: int,
           dilation: int = 1) -> jnp.ndarray:
    """torch Conv1d on channel-last input. w: (k, in, out) flax layout."""
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + b


def conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, stride: int,
                     padding: int) -> jnp.ndarray:
    """torch ConvTranspose1d(stride, padding) on channel-last input.

    Implemented as lhs-dilated conv with flipped kernel and pad k-1-p, which
    is exactly torch's transposed-convolution definition.
    w: (k, in, out) where in/out are the transpose's in/out channels.
    """
    k = w.shape[0]
    w_flipped = w[::-1]
    pad = k - 1 - padding
    return jax.lax.conv_general_dilated(
        x, w_flipped,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + b


def pack_time(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """(B, T, C) -> (B, T//p, p*C): p consecutive time steps become channel
    blocks (phase-major). Exact relayout; requires T % p == 0."""
    b, t, c = x.shape
    return x.reshape(b, t // p, p * c)


def unpack_time(x: jnp.ndarray, p: int) -> jnp.ndarray:
    b, u, pc = x.shape
    return x.reshape(b, u * p, pc // p)


def _toeplitz_packed_weight(w: jnp.ndarray, p: int, dilation: int):
    """Block-Toeplitz weight for running a SAME-padded dilated conv in the
    time-packed domain.

    The vocoder's narrow-channel stages (C=32/64) fill only a quarter/half of
    the MXU's 128 output lanes, measured at ~8%/~34% of bf16 peak on a v5e
    (BASELINE.md stage breakdown). Packing p time steps into channels makes
    every matmul 128-wide at the cost of kernel-overlap zeros in the packed
    weight; measured on raw convs this wins 1.4-2.8x per conv
    (scripts/bench_conv_packing.py).

    For odd k: y[t] = sum_j w[j] @ x[t + (j-(k-1)/2)*d]. With t = p*u + s and
    o = s + (j-(k-1)/2)*d = p*q + r, the packed weight is
    wp[q-qmin, r*C:(r+1)*C, s*C:(s+1)*C] = w[j] — every (j, s) maps to a
    distinct (q, r) slot, and out-of-range packed reads correspond exactly to
    the original conv's zero padding, so the rewrite is EXACT (up to float
    summation order).

    Returns (wp, (lo, hi)) where (lo, hi) is the packed-domain padding.
    """
    k, cin, cout = w.shape
    assert k % 2 == 1, "packed rewrite assumes odd kernel (SAME padding)"
    half = (k - 1) // 2
    offs = [(j - half) * dilation for j in range(k)]
    qs = [(s + off) // p for s in range(p) for off in offs]
    qmin, qmax = min(qs), max(qs)
    kp = qmax - qmin + 1
    wp = jnp.zeros((kp, p * cin, p * cout), w.dtype)
    for j in range(k):
        for s in range(p):
            o = s + offs[j]
            q, r = o // p, o % p
            wp = wp.at[q - qmin, r * cin:(r + 1) * cin,
                       s * cout:(s + 1) * cout].set(w[j])
    return wp, (-qmin, qmax)


def conv1d_packed(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                  dilation: int, p: int) -> jnp.ndarray:
    """SAME-padded dilated conv on a time-packed (B, T//p, p*C) input."""
    wp, (lo, hi) = _toeplitz_packed_weight(w, p, dilation)
    out = jax.lax.conv_general_dilated(
        x, wp,
        window_strides=(1,),
        padding=[(lo, hi)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + jnp.tile(b, p)


class ResBlock(nn.Module):
    """MRF residual block (reference hifigan/models.py:20-109).

    `pack > 1`: input/output are time-packed (B, T//pack, pack*C) and every
    conv runs as a block-Toeplitz 128-lane matmul (see _toeplitz_packed_weight).
    """

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32
    pack: int = 1
    # declare params and return them instead of computing (the generator's
    # fused_mrf path feeds them to the Pallas stage kernel; same names and
    # shapes, so checkpoints are interchangeable between both paths)
    return_params: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.return_params:
            params = {}
            for i in range(len(self.dilations)):
                for cn in ("convs1", "convs2"):
                    params[f"{cn}_{i}_kernel"] = self.param(
                        f"{cn}_{i}_kernel", nn.initializers.normal(0.01),
                        (self.kernel_size, self.channels, self.channels),
                        self.dtype)
                    params[f"{cn}_{i}_bias"] = self.param(
                        f"{cn}_{i}_bias", nn.initializers.zeros,
                        (self.channels,), self.dtype)
            return params
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            w1 = self.param(
                f"convs1_{i}_kernel",
                nn.initializers.normal(0.01),
                (self.kernel_size, self.channels, self.channels), self.dtype,
            )
            b1 = self.param(f"convs1_{i}_bias", nn.initializers.zeros,
                            (self.channels,), self.dtype)
            if self.pack > 1:
                xt = conv1d_packed(xt, w1, b1, d, self.pack)
            else:
                xt = conv1d(xt, w1, b1, get_padding(self.kernel_size, d), d)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            w2 = self.param(
                f"convs2_{i}_kernel",
                nn.initializers.normal(0.01),
                (self.kernel_size, self.channels, self.channels), self.dtype,
            )
            b2 = self.param(f"convs2_{i}_bias", nn.initializers.zeros,
                            (self.channels,), self.dtype)
            if self.pack > 1:
                xt = conv1d_packed(xt, w2, b2, 1, self.pack)
            else:
                xt = conv1d(xt, w2, b2, get_padding(self.kernel_size, 1), 1)
            x = xt + x
        return x


class HiFiGANGenerator(nn.Module):
    """Reference hifigan/models.py:112-174."""

    n_mels: int = 80
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    dtype: jnp.dtype = jnp.float32
    # pack time steps into channels for sub-128-channel MRF stages so their
    # convs fill the MXU's 128 output lanes (measured: the C=32 stage runs at
    # ~8% of peak unpacked; the packed rewrite is exact up to float order).
    # False restores bit-level parity with the plain conv path.
    time_packing: bool = True
    # run sub-128-channel MRF stages as ONE fused Pallas kernel per stage
    # (ops/fused_mrf.py): activations stay in VMEM across all 18 convs and
    # dilated taps stack along the matmul contraction dim (no Toeplitz
    # zeros). Inference-only (no VJP); takes precedence over time_packing
    # for the stages it covers. interpret=True runs it on CPU for tests.
    fused_mrf: bool = False
    fused_interpret: bool = False

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel: (B, T, n_mels) channel-last -> wav (B, T * prod(rates))."""
        ch = self.upsample_initial_channel
        w = self.param("conv_pre_kernel", nn.initializers.normal(0.01),
                       (7, self.n_mels, ch), self.dtype)
        b = self.param("conv_pre_bias", nn.initializers.zeros, (ch,), self.dtype)
        x = conv1d(mel, w, b, padding=3)

        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            in_ch = ch // (2 ** i)
            out_ch = ch // (2 ** (i + 1))
            wu = self.param(f"ups_{i}_kernel", nn.initializers.normal(0.01),
                            (k, in_ch, out_ch), self.dtype)
            bu = self.param(f"ups_{i}_bias", nn.initializers.zeros, (out_ch,), self.dtype)
            x = conv_transpose1d(x, wu, bu, stride=u, padding=(k - u) // 2)

            if (self.fused_mrf and out_ch <= 64
                    and all(rk % 2 == 1 for rk in self.resblock_kernel_sizes)):
                from ..ops.fused_mrf import fused_mrf_stage

                params = [
                    ResBlock(out_ch, rk, tuple(rd), self.dtype,
                             return_params=True, name=f"resblock_{i}_{j}")(x)
                    for j, (rk, rd) in enumerate(
                        zip(self.resblock_kernel_sizes,
                            self.resblock_dilation_sizes))
                ]
                x = fused_mrf_stage(
                    x, params, self.resblock_kernel_sizes,
                    self.resblock_dilation_sizes,
                    interpret=self.fused_interpret)
                continue

            pack = 1
            # measured on-chip: p=4 (C=32) wins 2.3x, but p=2 (C=64) LOSES
            # slightly — the k=3/k=7 kernel-overlap inflation at p=2 isn't
            # paid back by filling 64->128 lanes — so pack only below C=64
            if (self.time_packing and out_ch < 64
                    and all(rk % 2 == 1 for rk in self.resblock_kernel_sizes)):
                # cap at the measured optimum p=4 (C=32). Beyond that the
                # Toeplitz weight build emits k*p update-slices per conv —
                # at p=32/64 (tiny test configs: out_ch 4/2) one generator
                # graph carried ~24k such ops, which blew XLA:CPU compile
                # times to minutes and segfaulted its codegen on two suites
                pack = min(4, 128 // out_ch)
                # translation invariance: streaming slices mel at frame
                # granularity, so packed phases stay window-independent only
                # if pack divides the cumulative upsampling factor here —
                # otherwise the float summation order would depend on the
                # window offset and streamed != full at the int16 LSB level
                cum = int(np.prod(self.upsample_rates[: i + 1]))
                while pack > 1 and cum % pack != 0:
                    pack //= 2
                # packing also requires this stage's T % pack == 0
                if pack > 1 and x.shape[1] % pack != 0:
                    pack = 1
            if pack > 1:
                x = pack_time(x, pack)
            xs = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                r = ResBlock(out_ch, rk, tuple(rd), self.dtype, pack,
                             name=f"resblock_{i}_{j}")(x)
                xs = r if xs is None else xs + r
            x = xs / len(self.resblock_kernel_sizes)
            if pack > 1:
                x = unpack_time(x, pack)

        x = nn.leaky_relu(x)
        wp = self.param("conv_post_kernel", nn.initializers.normal(0.01),
                        (7, x.shape[-1], 1), self.dtype)
        bp = self.param("conv_post_bias", nn.initializers.zeros, (1,), self.dtype)
        x = conv1d(x, wp, bp, padding=3)
        return jnp.tanh(x)[..., 0]


def convert_torch_state_dict(state_dict, config) -> dict:
    """Map a torch HiFi-GAN generator state_dict (weight-norm removed or not)
    to this module's params. torch conv weight (out, in, k) -> flax (k, in, out)."""

    def fold_wn(prefix):
        if prefix + ".weight" in state_dict:
            w = state_dict[prefix + ".weight"]
        else:  # weight-normed: w = g * v / ||v||
            v = state_dict[prefix + ".weight_v"]
            g = state_dict[prefix + ".weight_g"]
            norm = np.sqrt((np.asarray(v) ** 2).sum(axis=(1, 2), keepdims=True))
            w = np.asarray(g) * np.asarray(v) / norm
        b = state_dict[prefix + ".bias"]
        return np.asarray(w), np.asarray(b)

    params = {}

    def put_conv(name, prefix, transpose=False):
        w, b = fold_wn(prefix)
        # torch Conv1d: (out, in, k); ConvTranspose1d: (in, out, k)
        if transpose:
            w = np.transpose(w, (2, 0, 1))  # (k, in, out)
        else:
            w = np.transpose(w, (2, 1, 0))  # (k, in, out)
        params[name + "_kernel"] = w
        params[name + "_bias"] = b

    put_conv("conv_pre", "conv_pre")
    n_up = len(config.get("upsample_rates", [8, 8, 2, 2]))
    n_res = len(config.get("resblock_kernel_sizes", [3, 7, 11]))
    for i in range(n_up):
        put_conv(f"ups_{i}", f"ups.{i}", transpose=True)
        for j in range(n_res):
            ridx = i * n_res + j
            block = {}
            for c in range(3):
                w, b = fold_wn(f"resblocks.{ridx}.convs1.{c}")
                block[f"convs1_{c}_kernel"] = np.transpose(w, (2, 1, 0))
                block[f"convs1_{c}_bias"] = b
                w, b = fold_wn(f"resblocks.{ridx}.convs2.{c}")
                block[f"convs2_{c}_kernel"] = np.transpose(w, (2, 1, 0))
                block[f"convs2_{c}_bias"] = b
            params[f"resblock_{i}_{j}"] = block
    put_conv("conv_post", "conv_post")
    return params
