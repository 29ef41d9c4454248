"""Vocoder loading + batched mel->wav inference.

Reference: utils/model.py:42-92. Honors the HiFi-GAN config.json schema and
torch checkpoint format (converted to flax params at load; torch is only
needed when a torch checkpoint is actually supplied). MelGAN is not bundled
(the reference pulls it from torch.hub at runtime, which a zero-egress
deployment cannot do) — requesting it raises with a clear message.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hifigan import HiFiGANGenerator, convert_torch_state_dict

DEFAULT_HIFIGAN_CONFIG = {
    # hifigan/config.json (universal V1)
    "upsample_rates": [8, 8, 2, 2],
    "upsample_kernel_sizes": [16, 16, 4, 4],
    "upsample_initial_channel": 512,
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    "num_mels": 80,
}


class Vocoder:
    def __init__(self, generator, params, hop_length: int = 256,
                 max_wav_value: float = 32768.0, mel_scale: float = 1.0):
        self.generator = generator
        self.params = params
        self.hop_length = hop_length
        self.max_wav_value = max_wav_value
        # MelGAN checkpoints expect log10 mels: natural-log mels / ln(10)
        # (reference utils/model.py:76-78)
        self.mel_scale = mel_scale
        gen_dtype = getattr(generator, "dtype", jnp.float32)
        # cast to the generator's compute dtype: callers hand over f32 mels
        # (e.g. synthesize_long's stitched numpy) even when the vocoder
        # runs bf16
        self._infer = jax.jit(
            lambda p, mel: generator.apply(
                {"params": p}, (mel * mel_scale).astype(gen_dtype)))

    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, T, n_mels) channel-last log-mel -> (B, T*hop) float wav."""
        return self._infer(self.params, mel)


def get_vocoder(
    model_config,
    config_dir: Optional[str] = None,
    checkpoint: Optional[str] = None,
    rng_seed: int = 0,
) -> Vocoder:
    """Build the vocoder named by model_config.vocoder
    (reference get_vocoder, utils/model.py:42-71).

    checkpoint: optional torch generator ckpt ('generator' state_dict, the
    upstream HiFi-GAN format) — converted to flax params. Without one the
    generator is randomly initialized (the reference ships its checkpoints as
    missing large blobs, so none are available in-tree either).
    """
    name = model_config.vocoder.model
    if checkpoint and not os.path.exists(checkpoint):
        # a requested-but-missing checkpoint must NOT silently random-init:
        # the server would warm up and serve pure-noise audio with no signal
        # that the weights never loaded
        raise FileNotFoundError(f"vocoder checkpoint not found: {checkpoint}")
    if name == "MelGAN":
        # reference pulls this from torch.hub (utils/model.py:46-56); here a
        # LOCAL descript-MelGAN torch checkpoint converts to the first-party
        # flax generator (models/melgan.py); without one it random-inits
        # (smoke-test parity with the HiFi-GAN branch)
        from ..models.melgan import MelGANGenerator
        from ..models.melgan import convert_torch_state_dict as convert_melgan

        gen = MelGANGenerator()
        if checkpoint and os.path.exists(checkpoint):
            import torch

            ckpt = torch.load(checkpoint, map_location="cpu", weights_only=True)
            for key in ("model_g", "generator", "netG", "state_dict"):
                if isinstance(ckpt, dict) and key in ckpt:
                    ckpt = ckpt[key]
            state = {k: v.numpy() for k, v in ckpt.items()}
            params = convert_melgan(state)
        else:
            mel = jnp.zeros((1, 8, 80))
            params = gen.init(jax.random.PRNGKey(rng_seed), mel)["params"]
        return Vocoder(gen, params, mel_scale=1.0 / float(np.log(10.0)))
    if name != "HiFi-GAN":
        raise ValueError(f"unknown vocoder {name!r}")

    cfg = dict(DEFAULT_HIFIGAN_CONFIG)
    for candidate in (
        os.path.join(config_dir or "", "hifigan_config.json"),
        os.path.join(os.path.dirname(__file__), "..", "..", "hifigan", "config.json"),
    ):
        if candidate and os.path.exists(candidate):
            with open(candidate) as f:
                cfg.update(json.load(f))
            break

    gen = HiFiGANGenerator(
        n_mels=cfg.get("num_mels", 80),
        upsample_rates=tuple(cfg["upsample_rates"]),
        upsample_kernel_sizes=tuple(cfg["upsample_kernel_sizes"]),
        upsample_initial_channel=cfg["upsample_initial_channel"],
        resblock_kernel_sizes=tuple(cfg["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(tuple(d) for d in cfg["resblock_dilation_sizes"]),
    )

    if checkpoint and os.path.exists(checkpoint):
        params = load_generator_checkpoint(checkpoint, gen, cfg)
    else:
        mel = jnp.zeros((1, 8, cfg.get("num_mels", 80)))
        params = gen.init(jax.random.PRNGKey(rng_seed), mel)["params"]

    return Vocoder(gen, params)


def load_generator_checkpoint(path: str, gen: HiFiGANGenerator, cfg: dict):
    """Generator params from either checkpoint format: a torch `{'generator':
    state_dict}` file (upstream / reference format) or a flax `.msgpack`
    written by cli/train_vocoder (first-party training)."""
    with open(path, "rb") as f:
        head = f.read(2)
    is_torch = head.startswith(b"PK") or head.startswith(b"\x80")
    if path.endswith(".msgpack") or not is_torch:
        import flax

        mel = jnp.zeros((1, 8, cfg.get("num_mels", 80)))
        template = gen.init(jax.random.PRNGKey(0), mel)["params"]
        with open(path, "rb") as f:
            return flax.serialization.from_bytes(template, f.read())
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    state = ckpt.get("generator", ckpt)
    state = {k: v.numpy() for k, v in state.items()}
    return convert_torch_state_dict(state, cfg)


def vocoder_infer(
    mels: jnp.ndarray,
    vocoder: Vocoder,
    lengths: Optional[np.ndarray] = None,
) -> List[np.ndarray]:
    """(B, T, n_mels) -> list of int16 wavs, truncated to `lengths` samples
    (reference vocoder_infer, utils/model.py:74-92)."""
    wavs = np.asarray(vocoder(mels))
    # clip before the int16 cast: loud samples would integer-wrap into
    # artifacts otherwise (matches ServingEngine.synthesize)
    wavs = np.clip(wavs * vocoder.max_wav_value, -32768, 32767).astype("int16")
    out = [w for w in wavs]
    if lengths is not None:
        out = [w[: int(l)] for w, l in zip(out, lengths)]
    return out


def measure_receptive_field_frames(vocoder: Vocoder, probe_frames: int = 257) -> int:
    """Mel-frame receptive-field radius of the loaded generator, measured
    empirically (impulse response support), so streaming context adapts to
    ANY convolutional vocoder (custom HiFi-GAN configs, MelGAN) instead of
    assuming the stock v1 architecture (~15 frames). Cached per Vocoder."""
    cached = getattr(vocoder, "_rf_frames", None)
    if cached is not None:
        return cached
    h = vocoder.hop_length
    center = probe_frames // 2
    n_mels = 80
    base = np.zeros((1, probe_frames, n_mels), np.float32)
    probe = base.copy()
    probe[0, center, :] = 1.0
    d = np.abs(np.asarray(vocoder(jnp.asarray(probe))[0], np.float32)
               - np.asarray(vocoder(jnp.asarray(base))[0], np.float32))
    nz = np.nonzero(d > 1e-12)[0]
    if nz.size == 0:
        rf = 1  # degenerate (e.g. zero weights)
    else:
        lo, hi = int(nz[0]), int(nz[-1])
        if lo == 0 or hi == d.size - 1:
            raise ValueError(
                f"vocoder receptive field exceeds the {probe_frames}-frame "
                "probe — pass context_frames explicitly")
        rf = max((center * h - lo + h - 1) // h,
                 (hi - center * h) // h + 1)
    vocoder._rf_frames = int(rf)
    return vocoder._rf_frames


def vocode_streaming(
    vocoder: Vocoder,
    mel: jnp.ndarray,
    chunk_frames: int = 192,
    context_frames: Optional[int] = None,
):
    """Stream the vocoder: yield int16 wav chunks whose concatenation equals
    `vocoder_infer` on the full mel.

    The generators are fully convolutional, so an interior output sample
    depends only on mel frames within the receptive field (~15 per side for
    stock HiFi-GAN v1); `context_frames` defaults to the MEASURED field of
    the loaded generator + margin (measure_receptive_field_frames), and
    tests/test_vocoder_streaming.py asserts exact equality against the full
    run. Boundary chunks keep the true utterance edge inside the window so
    the generator's own edge padding (zero or reflection) applies exactly
    as in the full run.

    Why stream: first-audio latency becomes the vocode time of
    `chunk_frames + 2*context_frames` frames instead of the whole utterance,
    memory stays bounded for unbounded-length synthesis, and only two window
    shapes compile regardless of input length (short inputs < one chunk
    reuse the interior shape via edge-aligned padded windows; only inputs
    under 2*context — <0.6 s of audio — vocode at their own length).

    mel: (1, T, n_mels) log-mel. Yields np.int16 arrays.
    """
    if mel.ndim != 3 or mel.shape[0] != 1:
        raise ValueError("vocode_streaming expects a single utterance (1, T, n_mels)")
    if context_frames is None:
        context_frames = measure_receptive_field_frames(vocoder) + 2
    if chunk_frames < 1 or context_frames < 0:
        raise ValueError(
            f"chunk_frames must be >= 1 and context_frames >= 0 "
            f"(got {chunk_frames}, {context_frames})")
    t = mel.shape[1]
    k, c = chunk_frames, context_frames
    h = vocoder.hop_length
    s = k + 2 * c  # the interior window shape

    def to_int16(w):
        return np.clip(np.asarray(w) * vocoder.max_wav_value,
                       -32768, 32767).astype("int16")

    mel = np.asarray(mel, np.float32)

    if t <= 2 * c:
        # too short to split exactly; vocode at own length (tiny compile)
        yield to_int16(vocoder(jnp.asarray(mel))[0])
        return

    if t <= s:
        # one-chunk inputs still reuse the fixed interior shape: two
        # edge-aligned zero-padded windows whose kept regions stay >= c
        # frames away from the artificial (zero-mel) side, so each true
        # edge sees the generator's own padding exactly as the full run
        left = np.pad(mel, ((0, 0), (0, s - t), (0, 0)))
        wav = vocoder(jnp.asarray(left))[0]
        yield to_int16(wav[: (t - c) * h])
        right = np.pad(mel, ((0, 0), (s - t, 0), (0, 0)))
        wav = vocoder(jnp.asarray(right))[0]
        yield to_int16(wav[(s - c) * h :])
        return

    # first chunk: true left boundary, C right context (shape K+C)
    wav = vocoder(jnp.asarray(mel[:, : k + c]))[0]
    yield to_int16(wav[: k * h])

    pos = k
    # interior chunks: C real frames of context each side (shape K+2C)
    while pos + k + c <= t:
        wav = vocoder(jnp.asarray(mel[:, pos - c : pos + k + c]))[0]
        yield to_int16(wav[c * h : (c + k) * h])
        pos += k

    remaining = t - pos
    if remaining > 0:
        # final chunk right-aligned at the true end (same K+2C shape as the
        # interior): keeps >= C left context since remaining <= K+C
        wav = vocoder(jnp.asarray(mel[:, t - s :]))[0]
        yield to_int16(wav[(s - remaining) * h :])
