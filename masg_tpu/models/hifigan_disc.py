"""HiFi-GAN discriminators (multi-period + multi-scale) for vocoder training.

The reference repo ships only the generator (hifigan/models.py:112-174) and
consumes pretrained checkpoints; training a vocoder for a new corpus needs
the upstream jik876/hifi-gan discriminators, re-built here TPU-first:

- channel-last layouts, `lax.conv_general_dilated` with feature_group_count
  for the grouped scale convs;
- modules hold PLAIN kernels. The weight-norm / spectral-norm
  parametrizations the GAN needs for stable training are pure pytree
  transforms applied by the trainer (train/vocoder.py), so these modules
  stay inference-clean and torch checkpoints convert 1:1.

Structure matches upstream hifi-gan models.py (DiscriminatorP/S,
MultiPeriodDiscriminator, MultiScaleDiscriminator) so converted torch
weights reproduce the same logits/feature maps (tests/test_vocoder_training.py).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1

# channel progression of DiscriminatorP's (5,1)-kernel stack
_PERIOD_CHANNELS = (32, 128, 512, 1024)
# (out_ch, kernel, stride, groups) of DiscriminatorS's conv stack
_SCALE_LAYERS = (
    (128, 15, 1, 1),
    (128, 41, 2, 4),
    (256, 41, 2, 16),
    (512, 41, 4, 16),
    (1024, 41, 4, 16),
    (1024, 41, 1, 16),
    (1024, 5, 1, 1),
)

# torch Conv default: kaiming_uniform(a=sqrt(5)) == uniform(+-1/sqrt(fan_in))
_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _conv(x, w, b, stride, padding, groups=1):
    """1D conv, channel-last (B, T, C), kernel (k, in/groups, out)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[padding],
        feature_group_count=groups, dimension_numbers=("NWC", "WIO", "NWC"))
    return out + b


class PeriodDiscriminator(nn.Module):
    """Upstream DiscriminatorP: fold T into (T/period, period) and run a
    (5,1)-kernel Conv2d stack over the period-major view."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    channels: Tuple[int, ...] = _PERIOD_CHANNELS

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """x: (B, T) audio -> (flattened logits (B, N), feature maps)."""
        b, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - t % self.period
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        # (B, T/p, p, 1): height = folded time, width = phase, channel-last
        x = x.reshape(b, t // self.period, self.period, 1)

        fmap = []
        k = self.kernel_size
        in_ch = 1
        stack = list(self.channels) + [self.channels[-1]]
        for i, out_ch in enumerate(stack):
            stride = self.stride if i < len(self.channels) else 1
            pad = (k - 1) // 2 if i < len(self.channels) else 2
            w = self.param(f"convs_{i}_kernel", _conv_init,
                           (k, 1, in_ch, out_ch), jnp.float32)
            bias = self.param(f"convs_{i}_bias", nn.initializers.zeros,
                              (out_ch,), jnp.float32)
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(stride, 1),
                padding=[(pad, pad), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
            in_ch = out_ch
        w = self.param("conv_post_kernel", _conv_init, (3, 1, in_ch, 1),
                       jnp.float32)
        bias = self.param("conv_post_bias", nn.initializers.zeros, (1,),
                          jnp.float32)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        fmap.append(x)
        return x.reshape(b, -1), fmap


class ScaleDiscriminator(nn.Module):
    """Upstream DiscriminatorS: 1D conv stack with large grouped kernels."""

    layers: Tuple[Tuple[int, int, int, int], ...] = _SCALE_LAYERS

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """x: (B, T) audio -> (flattened logits, feature maps)."""
        b = x.shape[0]
        x = x[..., None]  # (B, T, 1)
        fmap = []
        in_ch = 1
        for i, (out_ch, k, stride, groups) in enumerate(self.layers):
            w = self.param(f"convs_{i}_kernel", _conv_init,
                           (k, in_ch // groups, out_ch), jnp.float32)
            bias = self.param(f"convs_{i}_bias", nn.initializers.zeros,
                              (out_ch,), jnp.float32)
            x = _conv(x, w, bias, stride, ((k - 1) // 2, (k - 1) // 2), groups)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
            in_ch = out_ch
        w = self.param("conv_post_kernel", _conv_init, (3, in_ch, 1), jnp.float32)
        bias = self.param("conv_post_bias", nn.initializers.zeros, (1,), jnp.float32)
        x = _conv(x, w, bias, 1, (1, 1))
        fmap.append(x)
        return x.reshape(b, -1), fmap


def _avg_pool_4_2_pad2(x: jnp.ndarray) -> jnp.ndarray:
    """torch AvgPool1d(4, 2, padding=2) with count_include_pad=True."""
    xp = jnp.pad(x, ((0, 0), (2, 2)))
    summed = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add, window_dimensions=(1, 4),
        window_strides=(1, 2), padding="VALID")
    return summed / 4.0


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    channels: Tuple[int, ...] = _PERIOD_CHANNELS

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        """(B, T) real + generated audio -> (r_logits, g_logits, r_fmaps, g_fmaps)."""
        rs, gs, fr, fg = [], [], [], []
        for p in self.periods:
            d = PeriodDiscriminator(p, channels=self.channels, name=f"disc_{p}")
            r, fmap_r = d(y)
            g, fmap_g = d(y_hat)
            rs.append(r), gs.append(g), fr.append(fmap_r), fg.append(fmap_g)
        return rs, gs, fr, fg


class MultiScaleDiscriminator(nn.Module):
    """Three DiscriminatorS at rates 1x, 1/2x, 1/4x (avg-pooled). Upstream
    puts spectral norm on the full-rate scale only — the trainer applies it
    to this module's `disc_0` subtree (SPECTRAL_NORM_SCOPE).

    With `y_hat=None` only the y pass runs (single-input mode): the trainer
    applies the module once per pass with DIFFERENTLY-FOLDED spectral-norm
    kernels, reproducing torch's per-forward power-iteration cadence."""

    n_scales: int = 3
    layers: Tuple[Tuple[int, int, int, int], ...] = _SCALE_LAYERS

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat=None):
        rs, gs, fr, fg = [], [], [], []
        for i in range(self.n_scales):
            if i != 0:
                y = _avg_pool_4_2_pad2(y)
                y_hat = None if y_hat is None else _avg_pool_4_2_pad2(y_hat)
            d = ScaleDiscriminator(layers=self.layers, name=f"disc_{i}")
            r, fmap_r = d(y)
            rs.append(r), fr.append(fmap_r)
            if y_hat is not None:
                g, fmap_g = d(y_hat)
                gs.append(g), fg.append(fmap_g)
        if y_hat is None:
            return rs, fr
        return rs, gs, fr, fg


# the MSD subtree whose kernels use spectral norm instead of weight norm
SPECTRAL_NORM_SCOPE = "disc_0"


def build_discriminators(cfg: dict):
    """(MPD, MSD) from a hifigan config dict. Optional keys `mpd_periods`,
    `mpd_channels`, `msd_scales`, `msd_layers` override the upstream V1
    sizes (useful for fast experiments and tests); absent, the defaults
    reproduce jik876/hifi-gan exactly."""
    mpd = MultiPeriodDiscriminator(
        periods=tuple(cfg.get("mpd_periods", (2, 3, 5, 7, 11))),
        channels=tuple(cfg.get("mpd_channels", _PERIOD_CHANNELS)))
    msd = MultiScaleDiscriminator(
        n_scales=int(cfg.get("msd_scales", 3)),
        layers=tuple(tuple(l) for l in cfg.get("msd_layers", _SCALE_LAYERS)))
    return mpd, msd


def convert_torch_period_disc(state_dict, prefix: str) -> dict:
    """torch DiscriminatorP params (weight-norm v/g) -> plain flax params.
    Used by tests and by importing upstream `do_*` discriminator checkpoints."""
    import numpy as np

    params = {}
    for i in range(5):
        v = np.asarray(state_dict[f"{prefix}convs.{i}.weight_v"])
        g = np.asarray(state_dict[f"{prefix}convs.{i}.weight_g"])
        w = g * v / np.sqrt((v ** 2).sum(axis=(1, 2, 3), keepdims=True))
        # torch Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out)
        params[f"convs_{i}_kernel"] = np.transpose(w, (2, 3, 1, 0))
        params[f"convs_{i}_bias"] = np.asarray(state_dict[f"{prefix}convs.{i}.bias"])
    v = np.asarray(state_dict[f"{prefix}conv_post.weight_v"])
    g = np.asarray(state_dict[f"{prefix}conv_post.weight_g"])
    w = g * v / np.sqrt((v ** 2).sum(axis=(1, 2, 3), keepdims=True))
    params["conv_post_kernel"] = np.transpose(w, (2, 3, 1, 0))
    params["conv_post_bias"] = np.asarray(state_dict[f"{prefix}conv_post.bias"])
    return params
