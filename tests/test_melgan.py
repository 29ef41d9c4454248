"""MelGAN generator: shapes, torch-parity, and the local-checkpoint loader
(VERDICT r1 item 10).

The reference loads descriptinc/melgan-neurips via torch.hub
(utils/model.py:46-56); no source is vendored, so the torch comparison model
below is built from torch.nn primitives following the published descript
module order (mel2wav/modules.py: ReflectionPad+WNConv stem, per-ratio
WNConvTranspose + dilated residual blocks with 1x1 shortcuts, tanh head).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masg_tpu.models.melgan import MelGANGenerator, convert_torch_state_dict

TINY = dict(ngf=8, n_residual_layers=2, ratios=(4, 2))


def build_torch_descript_generator(torch, n_mels=80, ngf=32, n_residual_layers=3,
                                   ratios=(8, 8, 2, 2), seed=0):
    nn = torch.nn
    wn = torch.nn.utils.weight_norm

    class ResnetBlock(nn.Module):
        def __init__(self, dim, dilation):
            super().__init__()
            self.block = nn.Sequential(
                nn.LeakyReLU(0.2),
                nn.ReflectionPad1d(dilation),
                wn(nn.Conv1d(dim, dim, kernel_size=3, dilation=dilation)),
                nn.LeakyReLU(0.2),
                wn(nn.Conv1d(dim, dim, kernel_size=1)),
            )
            self.shortcut = wn(nn.Conv1d(dim, dim, kernel_size=1))

        def forward(self, x):
            return self.shortcut(x) + self.block(x)

    class Generator(nn.Module):
        def __init__(self):
            super().__init__()
            mult = int(2 ** len(ratios))
            model = [
                nn.ReflectionPad1d(3),
                wn(nn.Conv1d(n_mels, mult * ngf, kernel_size=7, padding=0)),
            ]
            for r in ratios:
                model += [
                    nn.LeakyReLU(0.2),
                    wn(nn.ConvTranspose1d(
                        mult * ngf, mult * ngf // 2, kernel_size=r * 2,
                        stride=r, padding=r // 2 + r % 2, output_padding=r % 2,
                    )),
                ]
                for j in range(n_residual_layers):
                    model += [ResnetBlock(mult * ngf // 2, dilation=3 ** j)]
                mult //= 2
            model += [
                nn.LeakyReLU(0.2),
                nn.ReflectionPad1d(3),
                wn(nn.Conv1d(ngf, 1, kernel_size=7, padding=0)),
                nn.Tanh(),
            ]
            self.model = nn.Sequential(*model)

        def forward(self, x):
            return self.model(x)

    torch.manual_seed(seed)
    g = Generator()
    g.eval()
    return g


def test_output_shape_full_config():
    gen = MelGANGenerator()
    mel = jnp.zeros((2, 17, 80))
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (2, 17 * 256)  # prod(8,8,2,2) = hop


def test_matches_torch_descript_generator():
    torch = pytest.importorskip("torch")
    ref = build_torch_descript_generator(torch, **TINY)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_torch_state_dict(state, **TINY)

    gen = MelGANGenerator(n_mels=80, **TINY)
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(2, 19, 80)).astype(np.float32)
    with torch.no_grad():
        ref_wav = ref(torch.from_numpy(mel).transpose(1, 2)).squeeze(1).numpy()
    ours = np.asarray(gen.apply({"params": params}, jnp.asarray(mel)))
    assert ours.shape == ref_wav.shape
    np.testing.assert_allclose(ours, ref_wav, atol=2e-5)


def test_get_vocoder_melgan_local_checkpoint(tmp_path):
    """get_vocoder(model='MelGAN', checkpoint=...) vocodes through the
    converted local checkpoint with the log10 mel scaling."""
    torch = pytest.importorskip("torch")
    from types import SimpleNamespace

    from masg_tpu.infer.vocoder import get_vocoder, vocoder_infer

    ref = build_torch_descript_generator(torch)  # full-size: hop 256
    ckpt = str(tmp_path / "melgan.pt")
    torch.save({"model_g": ref.state_dict()}, ckpt)

    cfg = SimpleNamespace(vocoder=SimpleNamespace(model="MelGAN", speaker="universal"))
    voc = get_vocoder(cfg, checkpoint=ckpt)
    mel_ln = np.random.default_rng(0).normal(size=(1, 11, 80)).astype(np.float32)
    wavs = vocoder_infer(jnp.asarray(mel_ln), voc)
    assert wavs[0].shape == (11 * 256,) and wavs[0].dtype == np.int16

    with torch.no_grad():
        ref_wav = ref(torch.from_numpy(
            (mel_ln / np.log(10.0)).astype(np.float32)).transpose(1, 2))
    ref_int16 = (ref_wav.squeeze(1).numpy() * 32768.0).astype(np.int16)
    # int16 quantization: allow +-1 lsb
    assert np.max(np.abs(wavs[0].astype(np.int32) - ref_int16[0].astype(np.int32))) <= 1


def test_get_vocoder_missing_checkpoint_raises(tmp_path):
    """A requested-but-missing checkpoint path must error loudly, never
    silently random-init (a serving deployment would emit pure noise)."""
    from types import SimpleNamespace

    from masg_tpu.infer.vocoder import get_vocoder

    for name in ("MelGAN", "HiFi-GAN"):
        cfg = SimpleNamespace(vocoder=SimpleNamespace(model=name, speaker="universal"))
        with pytest.raises(FileNotFoundError, match="not found"):
            get_vocoder(cfg, checkpoint=str(tmp_path / "nope.pt"))
