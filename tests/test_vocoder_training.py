"""HiFi-GAN vocoder training: parametrizations, discriminators, losses, step.

The reference ships generator inference only; training semantics here are
golden-tested against the upstream jik876/hifi-gan math (torch oracles
written inline — upstream's training code is not in the reference repo).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masg_tpu.models.hifigan import HiFiGANGenerator
from masg_tpu.models.hifigan_disc import (
    SPECTRAL_NORM_SCOPE,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    PeriodDiscriminator,
    ScaleDiscriminator,
    convert_torch_period_disc,
)
from masg_tpu.train.vocoder import (
    VocoderTrainState,
    discriminator_loss,
    export_generator_params,
    feature_loss,
    fold_params,
    generator_adv_loss,
    init_vocoder_train_state,
    make_vocoder_train_step,
    mel_spectrogram_hifigan,
    weight_norm_init,
)

TINY_GEN = dict(upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                upsample_initial_channel=32, resblock_kernel_sizes=(3,),
                resblock_dilation_sizes=((1, 2),))
TINY_CFG = {"segment_size": 512, "hop_size": 16, "n_fft": 64, "win_size": 64,
            "num_mels": 8, "sampling_rate": 22050, "fmin": 0, "fmax": 8000,
            "fmax_for_loss": None, "learning_rate": 2e-4, "adam_b1": 0.8,
            "adam_b2": 0.99, "lr_decay": 0.999,
            "upsample_rates": [4, 4], "upsample_kernel_sizes": [8, 8],
            "upsample_initial_channel": 32, "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 2]],
            # tiny discriminators (structure-preserving size override)
            "mpd_periods": [2, 3], "mpd_channels": [4, 8, 16, 16],
            "msd_scales": 2,
            "msd_layers": [[8, 15, 1, 1], [16, 41, 4, 4], [16, 5, 1, 1]]}


def tiny_generator():
    return HiFiGANGenerator(n_mels=8, **TINY_GEN)


def test_weight_norm_init_folds_to_identity():
    gen = tiny_generator()
    mel = jnp.zeros((1, 8, 8))
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    wn, sn = weight_norm_init(params)
    assert sn == {}
    folded, _ = fold_params(wn, None)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
                 params, folded)
    # scaling g scales the folded weight linearly (the WN reparametrization)
    wn2 = jax.tree.map(
        lambda x: x, wn)
    from flax.traverse_util import flatten_dict, unflatten_dict
    flat = flatten_dict(wn2)
    key = next(p for p in flat if p[-1].endswith("kernel_g"))
    flat[key] = flat[key] * 2.0
    folded2, _ = fold_params(unflatten_dict(flat), None)
    base = key[:-1] + (key[-1][:-2],)
    np.testing.assert_allclose(
        flatten_dict(folded2)[base], 2.0 * flatten_dict(folded)[base],
        rtol=1e-6)


def test_weight_norm_matches_torch_parametrization():
    """Fold of (v, g) == torch weight_norm's computed weight, for both conv
    (dim 0 = out) and conv-transpose (dim 0 = in) kernel layouts."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)

    # conv: torch (out, in, k) <-> ours (k, in, out)
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 6, 3))
    v = rng.normal(size=(6, 4, 3)).astype(np.float32)
    g = rng.uniform(0.5, 2.0, size=(6, 1, 1)).astype(np.float32)
    with torch.no_grad():
        conv.weight_v.copy_(torch.from_numpy(v))
        conv.weight_g.copy_(torch.from_numpy(g))
    w_torch = torch._weight_norm(conv.weight_v, conv.weight_g, 0).detach().numpy()
    tree = {"x_kernel_v": jnp.asarray(np.transpose(v, (2, 1, 0))),
            "x_kernel_g": jnp.asarray(g.reshape(1, 1, 6))}
    folded, _ = fold_params(tree, None)
    np.testing.assert_allclose(folded["x_kernel"],
                               np.transpose(w_torch, (2, 1, 0)), atol=1e-6)

    # conv transpose: torch (in, out, k) <-> ours (k, in, out), norm per in
    vt = rng.normal(size=(4, 6, 3)).astype(np.float32)
    gt = rng.uniform(0.5, 2.0, size=(4, 1, 1)).astype(np.float32)
    tconv = torch.nn.utils.weight_norm(torch.nn.ConvTranspose1d(4, 6, 3))
    with torch.no_grad():
        tconv.weight_v.copy_(torch.from_numpy(vt))
        tconv.weight_g.copy_(torch.from_numpy(gt))
    wt_torch = torch._weight_norm(tconv.weight_v, tconv.weight_g, 0).detach().numpy()
    tree = {"ups_0_kernel_v": jnp.asarray(np.transpose(vt, (2, 0, 1))),
            "ups_0_kernel_g": jnp.asarray(gt.reshape(1, 4, 1))}
    folded, _ = fold_params(tree, None)
    np.testing.assert_allclose(folded["ups_0_kernel"],
                               np.transpose(wt_torch, (2, 0, 1)), atol=1e-6)


def test_spectral_norm_matches_torch():
    """Our power-iteration sigma == torch.nn.utils.spectral_norm with the
    same (u, v) buffers, in both no-update (eval) and one-update modes."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    w = rng.normal(size=(6, 4, 5)).astype(np.float32)  # torch (out, in, k)
    u0 = rng.normal(size=6).astype(np.float32)
    u0 /= np.linalg.norm(u0)
    v0 = rng.normal(size=20).astype(np.float32)
    v0 /= np.linalg.norm(v0)

    conv = torch.nn.utils.spectral_norm(torch.nn.Conv1d(4, 6, 5))
    with torch.no_grad():
        conv.weight_orig.copy_(torch.from_numpy(w))
        conv.weight_u.copy_(torch.from_numpy(u0))
        conv.weight_v.copy_(torch.from_numpy(v0))

    tree = {"disc_0": {"convs_0_kernel": jnp.asarray(np.transpose(w, (2, 1, 0)))}}
    sn_state = {"disc_0/convs_0_kernel": {"u": jnp.asarray(u0), "v": jnp.asarray(v0)}}

    dummy = torch.zeros(1, 4, 8)
    # eval mode: stored u, v; no iteration (torch recomputes .weight in the
    # pre-forward hook, so a forward must run after the buffer copies)
    conv.eval()
    with torch.no_grad():
        conv(dummy)
        w_eval = conv.weight.detach().numpy()
    folded, _ = fold_params(tree, sn_state, update_sn=False)
    np.testing.assert_allclose(folded["disc_0"]["convs_0_kernel"],
                               np.transpose(w_eval, (2, 1, 0)), atol=3e-4)

    # train mode: one power iteration first
    conv.train()
    with torch.no_grad():
        conv(dummy)
        w_train = conv.weight.detach().numpy()
    folded, new_sn = fold_params(tree, sn_state, update_sn=True)
    np.testing.assert_allclose(folded["disc_0"]["convs_0_kernel"],
                               np.transpose(w_train, (2, 1, 0)), atol=3e-4)
    np.testing.assert_allclose(np.asarray(new_sn["disc_0/convs_0_kernel"]["u"]),
                               conv.weight_u.numpy(), atol=1e-5)


class _TorchDiscP:
    """Upstream DiscriminatorP oracle (jik876/hifi-gan models.py)."""

    def __init__(self, torch, period):
        import torch.nn as tnn
        from torch.nn.utils import weight_norm

        self.torch, self.period = torch, period
        k, s = 5, 3
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024)]
        self.convs = [weight_norm(tnn.Conv2d(i, o, (k, 1), (s, 1), padding=(2, 0)))
                      for i, o in chans]
        self.convs.append(weight_norm(tnn.Conv2d(1024, 1024, (k, 1), 1,
                                                 padding=(2, 0))))
        self.conv_post = weight_norm(tnn.Conv2d(1024, 1, (3, 1), 1, padding=(1, 0)))

    def state_dict(self):
        sd = {}
        for i, c in enumerate(self.convs):
            for n, p in c.named_parameters():
                sd[f"convs.{i}.{n.replace('_orig', '')}"] = p.detach()
            sd[f"convs.{i}.weight_v"] = c.weight_v.detach()
            sd[f"convs.{i}.weight_g"] = c.weight_g.detach()
            sd[f"convs.{i}.bias"] = c.bias.detach()
        sd["conv_post.weight_v"] = self.conv_post.weight_v.detach()
        sd["conv_post.weight_g"] = self.conv_post.weight_g.detach()
        sd["conv_post.bias"] = self.conv_post.bias.detach()
        return sd

    def forward(self, x):
        torch = self.torch
        import torch.nn.functional as F

        fmap = []
        b, c, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = F.pad(x, (0, n_pad), "reflect")
            t = t + n_pad
        x = x.view(b, c, t // self.period, self.period)
        for layer in self.convs:
            x = F.leaky_relu(layer(x), 0.1)
            fmap.append(x)
        x = self.conv_post(x)
        fmap.append(x)
        return torch.flatten(x, 1, -1), fmap


def test_period_discriminator_matches_torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    oracle = _TorchDiscP(torch, period=3)
    sd = oracle.state_dict()
    params = convert_torch_period_disc(sd, "")

    x = np.random.default_rng(2).normal(size=(2, 400)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_logits, ref_fmaps = oracle.forward(torch.from_numpy(x)[:, None, :])
    ours_logits, ours_fmaps = PeriodDiscriminator(period=3).apply(
        {"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours_logits), ref_logits.numpy(),
                               atol=2e-4)
    assert len(ours_fmaps) == len(ref_fmaps) == 6
    # torch fmaps are NCHW, ours NHWC
    for a, b in zip(ours_fmaps, ref_fmaps):
        np.testing.assert_allclose(np.asarray(a),
                                   b.numpy().transpose(0, 2, 3, 1), atol=2e-4)


def test_scale_discriminator_shapes_and_grouped_convs():
    """DiscriminatorS layer shapes match the upstream channel plan; grouped
    convs reduce params accordingly."""
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 512)), jnp.float32)
    d = ScaleDiscriminator()
    variables = d.init(jax.random.PRNGKey(0), x)
    logits, fmaps = d.apply(variables, x)
    assert logits.shape[0] == 2 and len(fmaps) == 8
    p = variables["params"]
    assert p["convs_1_kernel"].shape == (41, 128 // 4, 128)
    assert p["convs_4_kernel"].shape == (41, 512 // 16, 1024)
    # grouped conv equals a block-diagonal full conv
    w = np.zeros((41, 128, 128), np.float32)
    g = 4
    for i in range(g):
        w[:, i * 32:(i + 1) * 32, i * 32:(i + 1) * 32] = np.asarray(
            p["convs_1_kernel"]).reshape(41, 32, 4, 32)[:, :, i]
    # (just a structural smoke: shapes consistent)
    assert w.shape == (41, 128, 128)


def test_avg_pool_matches_torch():
    torch = pytest.importorskip("torch")
    from masg_tpu.models.hifigan_disc import _avg_pool_4_2_pad2

    x = np.random.default_rng(4).normal(size=(2, 101)).astype(np.float32)
    ref = torch.nn.AvgPool1d(4, 2, padding=2)(
        torch.from_numpy(x)[:, None, :]).numpy()[:, 0]
    ours = np.asarray(_avg_pool_4_2_pad2(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_mel_for_loss_matches_upstream_meldataset():
    """mel_spectrogram_hifigan == upstream meldataset.mel_spectrogram
    (manual reflect pad, center=False, +1e-9 magnitude, slaney mel,
    log-clamp)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    audio = (rng.normal(size=(2, 2048)) * 0.2).astype(np.float32)
    n_fft, hop, win, n_mels, sr = 256, 64, 256, 20, 22050

    y = torch.from_numpy(audio)
    pad = (n_fft - hop) // 2
    yp = torch.nn.functional.pad(y[:, None], (pad, pad), mode="reflect")[:, 0]
    spec = torch.stft(yp, n_fft, hop_length=hop, win_length=win,
                      window=torch.hann_window(win), center=False,
                      pad_mode="reflect", normalized=False, onesided=True,
                      return_complex=True)
    mag = torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9)
    from masg_tpu.audio.stft import mel_filterbank
    fb = torch.from_numpy(mel_filterbank(n_mels, n_fft, sr, 0.0, sr / 2.0))
    mel_ref = torch.log(torch.clamp(torch.matmul(fb.T, mag), min=1e-5)).numpy()

    ours = np.asarray(mel_spectrogram_hifigan(
        jnp.asarray(audio), n_fft=n_fft, hop_length=hop, win_length=win,
        n_mels=n_mels, sample_rate=sr, f_max=None))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), mel_ref, atol=2e-4)
    # frame count maps back to the waveform length exactly
    assert ours.shape[1] == audio.shape[1] // hop


def test_gan_losses_match_upstream_formulas():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(6)
    dr = [rng.normal(size=(2, 7)).astype(np.float32) for _ in range(3)]
    dg = [rng.normal(size=(2, 7)).astype(np.float32) for _ in range(3)]
    fr = [[rng.normal(size=(2, 4, 3)).astype(np.float32) for _ in range(2)]
          for _ in range(3)]
    fg = [[rng.normal(size=(2, 4, 3)).astype(np.float32) for _ in range(2)]
          for _ in range(3)]

    ref_d = sum(float(torch.mean((1 - torch.from_numpy(a)) ** 2)
                      + torch.mean(torch.from_numpy(b) ** 2))
                for a, b in zip(dr, dg))
    ref_g = sum(float(torch.mean((1 - torch.from_numpy(b)) ** 2)) for b in dg)
    ref_fm = 2 * sum(float(torch.mean(torch.abs(torch.from_numpy(a)
                                                - torch.from_numpy(b))))
                     for fa, fb in zip(fr, fg) for a, b in zip(fa, fb))

    assert np.isclose(float(discriminator_loss(
        [jnp.asarray(a) for a in dr], [jnp.asarray(b) for b in dg])), ref_d,
        atol=1e-5)
    assert np.isclose(float(generator_adv_loss(
        [jnp.asarray(b) for b in dg])), ref_g, atol=1e-5)
    assert np.isclose(float(feature_loss(
        [[jnp.asarray(x) for x in f] for f in fr],
        [[jnp.asarray(x) for x in f] for f in fg])), ref_fm, atol=1e-5)


def _sine_batch(rng, batch, n, sr=22050):
    f0 = rng.uniform(100, 300, size=(batch, 1))
    t = np.arange(n) / sr
    phase = rng.uniform(0, 2 * np.pi, size=(batch, 1))
    wav = 0.5 * np.sin(2 * np.pi * f0 * t + phase)
    wav += 0.2 * np.sin(4 * np.pi * f0 * t + phase)
    return wav.astype(np.float32)


def _tiny_setup(seed=0):
    from masg_tpu.models.hifigan_disc import build_discriminators

    gen = tiny_generator()
    mpd, msd = build_discriminators(TINY_CFG)
    state, (gen_tx, disc_tx) = init_vocoder_train_state(
        gen, mpd, msd, TINY_CFG, steps_per_epoch=10, rng=jax.random.PRNGKey(seed))
    step_fn = jax.jit(make_vocoder_train_step(gen, mpd, msd, gen_tx, disc_tx,
                                              TINY_CFG))
    return gen, state, step_fn


def test_vocoder_gan_training_learns():
    """Both updates execute and the generator learns: mel L1 on sine audio
    drops substantially from the random-init start within a few dozen steps."""
    gen, state, step_fn = _tiny_setup()
    rng = np.random.default_rng(7)
    first = None
    for i in range(60):
        audio = _sine_batch(rng, 4, TINY_CFG["segment_size"])
        state, metrics = step_fn(state, jnp.asarray(audio))
        if first is None:
            first = float(metrics.mel_l1)
    last = float(metrics.mel_l1)
    assert np.isfinite(last) and np.isfinite(float(metrics.disc_loss))
    assert last < 0.6 * first, (first, last)
    # spectral norm state actually moved (power iterations ran)
    assert state.sn_state and int(state.step) == 60


def test_vocoder_state_roundtrip_and_generator_export(tmp_path):
    """Save/restore the GAN state via msgpack; exported generator params load
    through get_vocoder and synthesize identically to the live state."""
    import flax

    from masg_tpu.cli.train_vocoder import load_msgpack, save_msgpack

    gen, state, step_fn = _tiny_setup()
    rng = np.random.default_rng(8)
    for _ in range(2):
        state, _ = step_fn(state, jnp.asarray(
            _sine_batch(rng, 2, TINY_CFG["segment_size"])))

    p = os.path.join(tmp_path, "vocoder_2.msgpack")
    save_msgpack(p, jax.device_get(state))
    gen2, state2, step_fn2 = _tiny_setup()
    state2 = load_msgpack(p, state2)
    batch = jnp.asarray(_sine_batch(rng, 2, TINY_CFG["segment_size"]))
    a, ma = step_fn(state, batch)
    b, mb = step_fn2(state2, batch)
    np.testing.assert_allclose(float(ma.gen_loss), float(mb.gen_loss), rtol=1e-5)

    # generator export -> plain-params mel->wav parity
    gp = os.path.join(tmp_path, "generator_2.msgpack")
    save_msgpack(gp, export_generator_params(state))
    from masg_tpu.infer.vocoder import load_generator_checkpoint

    params = load_generator_checkpoint(gp, gen, TINY_CFG)
    mel = mel_spectrogram_hifigan(
        batch, n_fft=TINY_CFG["n_fft"], hop_length=TINY_CFG["hop_size"],
        win_length=TINY_CFG["win_size"], n_mels=8,
        sample_rate=TINY_CFG["sampling_rate"])
    wav1 = gen.apply({"params": params}, mel)
    folded, _ = fold_params(state.gen_params, None)
    wav2 = gen.apply({"params": folded}, mel)
    np.testing.assert_allclose(np.asarray(wav1), np.asarray(wav2), atol=1e-6)


def test_vocoder_dp_matches_single_device():
    """The dp-sharded GAN step (params replicated, batch on 'data') produces
    the same losses as the unsharded step — the vocoder step is rng-free, so
    the trajectories must agree to float tolerance."""
    from masg_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    gen, state, step_fn = _tiny_setup()
    mesh = make_mesh(n_data=4, n_model=1)
    state_dp = replicate(jax.device_get(state), mesh)

    rng = np.random.default_rng(11)
    for i in range(3):
        audio = _sine_batch(rng, 4, TINY_CFG["segment_size"])
        state, m1 = step_fn(state, jnp.asarray(audio))
        state_dp, m2 = step_fn(state_dp, shard_batch(audio, mesh))
        np.testing.assert_allclose(float(m1.gen_loss), float(m2.gen_loss),
                                   rtol=2e-4)
        np.testing.assert_allclose(float(m1.disc_loss), float(m2.disc_loss),
                                   rtol=2e-4)


def test_fine_tuning_workflow_dump_mels_to_vocoder(tmp_path):
    """The full acoustic->vocoder fine-tuning loop (upstream --fine_tuning):
    train FS2 briefly, dump teacher-forced predicted mels via cli/dump_mels,
    fine-tune the vocoder on (predicted mel, ground-truth audio) pairs."""
    from fixtures import build_synthetic_experiment_dir

    from masg_tpu.cli.dump_mels import main as dump_main
    from masg_tpu.cli.train import main as train_main
    from masg_tpu.cli.train_vocoder import main as voc_main

    tmp = str(tmp_path)
    cfg_dir = build_synthetic_experiment_dir(
        tmp, n_speakers=2, utts_per_speaker=3, total_step=2, save_step=2,
        val_step=100, log_step=2)
    train_main(["-c", cfg_dir, "--max_steps", "2"])

    mel_dir = os.path.join(tmp, "predicted_mel")
    dump_main(["-c", cfg_dir, "--restore_step", "2", "--out", mel_dir,
               "--split", "train.txt", "val.txt"])
    names = sorted(os.listdir(mel_dir))
    # 6 utts split 0.2/0.2 -> 2 train + 2 val dumped (2 held out in test.txt)
    assert len(names) == 4 and all(n.endswith(".npy") for n in names)
    # teacher-forced dump is frame-aligned with the ground-truth features
    pre = os.path.join(tmp, "preprocessed_data", "SYNTH")
    gt = np.load(os.path.join(pre, "mel", names[0]))
    pred = np.load(os.path.join(mel_dir, names[0]))
    assert pred.shape == gt.shape and np.isfinite(pred).all()

    # fine-tune a tiny vocoder on the dumped mels + raw audio
    voc_cfg = {"segment_size": 2048, "hop_size": 256, "n_fft": 1024,
               "win_size": 1024, "num_mels": 80, "sampling_rate": 22050,
               "fmin": 0, "fmax": 8000, "fmax_for_loss": None,
               "batch_size": 2, "learning_rate": 2e-4, "adam_b1": 0.8,
               "adam_b2": 0.99, "lr_decay": 0.999,
               "upsample_rates": [8, 8, 4],
               "upsample_kernel_sizes": [16, 16, 8],
               "upsample_initial_channel": 16,
               "resblock_kernel_sizes": [3],
               "resblock_dilation_sizes": [[1, 2]],
               "mpd_periods": [2], "mpd_channels": [4, 8, 8, 8],
               "msd_scales": 1,
               "msd_layers": [[8, 15, 1, 1], [16, 41, 4, 4], [16, 5, 1, 1]]}
    cfg_path = os.path.join(tmp, "voc_config.json")
    with open(cfg_path, "w") as f:
        json.dump(voc_cfg, f)
    out = os.path.join(tmp, "voc_out")
    voc_main(["--wav_dir", os.path.join(tmp, "raw_data", "SYNTH"),
              "--mel_dir", mel_dir, "--out", out, "--config", cfg_path,
              "--steps", "2", "--save_step", "2", "--log_step", "1"])
    assert os.path.exists(os.path.join(out, "generator_2.msgpack"))
    log = [json.loads(l) for l in open(os.path.join(out, "log.jsonl"))]
    assert np.isfinite(log[-1]["gen_loss"])


def test_train_vocoder_cli_smoke(tmp_path):
    """The CLI trains a tiny config end-to-end from a wav dir and writes
    resumable + generator checkpoints."""
    from masg_tpu.audio.wavio import write_wav
    from masg_tpu.cli.train_vocoder import main

    wav_dir = os.path.join(tmp_path, "wavs")
    os.makedirs(wav_dir)
    rng = np.random.default_rng(9)
    for i in range(3):
        write_wav(os.path.join(wav_dir, f"u{i}.wav"),
                  _sine_batch(rng, 1, 4000)[0], 22050)

    cfg_path = os.path.join(tmp_path, "config.json")
    with open(cfg_path, "w") as f:
        json.dump({**TINY_CFG, "batch_size": 2}, f)
    out = os.path.join(tmp_path, "out")
    main(["--wav_dir", wav_dir, "--out", out, "--config", cfg_path,
          "--steps", "3", "--save_step", "3", "--log_step", "1"])
    assert os.path.exists(os.path.join(out, "vocoder_3.msgpack"))
    assert os.path.exists(os.path.join(out, "generator_3.msgpack"))
    # resume continues to the new step count
    main(["--wav_dir", wav_dir, "--out", out, "--config", cfg_path,
          "--steps", "5", "--save_step", "5", "--log_step", "1",
          "--restore", os.path.join(out, "vocoder_3.msgpack")])
    assert os.path.exists(os.path.join(out, "vocoder_5.msgpack"))


def test_segment_dataset_normalizes_per_file(tmp_path):
    """From-scratch training normalizes each FILE to 0.95 peak before
    cropping (upstream jik876 meldataset: audio = normalize(audio) * 0.95
    when not fine_tuning) so mixed-loudness corpora present one consistent
    amplitude target; --no_normalize restores raw amplitudes. Fine-tuning
    pairs stay raw (their mels came from the raw audio)."""
    import numpy as np

    from masg_tpu.audio.wavio import write_wav
    from masg_tpu.data.vocoder import VocoderSegmentDataset

    rng = np.random.default_rng(0)
    paths = []
    for i, scale in enumerate((0.05, 0.4)):
        w = (scale * np.sin(np.linspace(0, 300, 4000))
             * (1 + 0.1 * rng.normal(size=4000))).astype(np.float32)
        p = str(tmp_path / f"w{i}.wav")
        write_wav(p, w, 22050)
        paths.append(p)

    ds = VocoderSegmentDataset(paths, segment_size=4000, seed=1)
    batch = next(ds.batches(2))
    # segment_size == file length -> each row IS a whole file, normalized
    peaks = np.abs(batch).max(axis=1)
    np.testing.assert_allclose(peaks, 0.95, rtol=2e-3)

    raw = VocoderSegmentDataset(paths, segment_size=4000, seed=1,
                                normalize=False)
    raw_batch = next(raw.batches(2))
    raw_peaks = sorted(np.abs(raw_batch).max(axis=1))
    assert raw_peaks[0] < 0.1 and 0.3 < raw_peaks[1] < 0.5
