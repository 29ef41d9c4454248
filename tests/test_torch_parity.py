"""THE parity test: the reference torch FastSpeech2 (imported read-only from
/root/reference) with random weights vs our flax model with converted weights
— same inputs, teacher-forced eval forward, outputs must match."""

import importlib
import json
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_fastspeech2(tmp_path_factory):
    """Import the reference model/fastspeech2.py without triggering the
    model package __init__ (which drags in POT + the GE2E submodule's
    hardcoded hparam path)."""
    for name, attrs in [("unidecode", {"unidecode": lambda s: s}),
                        ("inflect", {"engine": lambda: None})]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for a, v in attrs.items():
                setattr(mod, a, v)
            sys.modules[name] = mod
    if REF not in sys.path:
        sys.path.insert(0, REF)

    pkg = types.ModuleType("refmodel")
    pkg.__path__ = [os.path.join(REF, "model")]
    sys.modules["refmodel"] = pkg
    fs2_mod = importlib.import_module("refmodel.fastspeech2")

    tmp = str(tmp_path_factory.mktemp("refcfg"))
    with open(os.path.join(tmp, "speakers.json"), "w") as f:
        json.dump({f"s{i}": [i, "M", "ja"] for i in range(4)}, f)
    with open(os.path.join(tmp, "stats.json"), "w") as f:
        json.dump({"pitch": [-2, 9, 0, 1], "energy": [-1.5, 8, 0, 1]}, f)

    pre = {
        "mel": {"n_mel_channels": 80},
        "pitch": {"feature": "phoneme_level"},
        "energy": {"feature": "phoneme_level"},
        "speaker_generation": {"metadata": {"gender": {"M": 0, "F": 1},
                                            "language": {"ja": 0, "en": 1}}},
    }
    mdl = {
        "transformer": {"encoder_layer": 2, "encoder_head": 2, "encoder_hidden": 64,
                        "decoder_layer": 2, "decoder_head": 2, "decoder_hidden": 64,
                        "conv_filter_size": 128, "conv_kernel_size": [9, 1],
                        "encoder_dropout": 0.2, "decoder_dropout": 0.2},
        "variance_predictor": {"filter_size": 64, "kernel_size": 3, "dropout": 0.5},
        "variance_embedding": {"pitch_quantization": "linear",
                               "energy_quantization": "linear", "n_bins": 256},
        "jdit": {"use_jdit": False},
        "multi_speaker": True,
        "max_seq_len": 1000,
        "speaker_generation": {"GMM_mixtures": 3},
    }
    torch.manual_seed(0)
    ref = fs2_mod.FastSpeech2(pre, mdl, tmp)
    ref.eval()
    return ref, pre, mdl


def our_config():
    from masg_tpu.core.config import (ExperimentConfig, ModelConfig,
                                      PreprocessConfig, Stats, TrainConfig)

    cfg = ExperimentConfig(
        preprocess=PreprocessConfig(),
        model=ModelConfig(),
        train=TrainConfig(),
        stats=Stats(pitch=(-2.0, 9.0, 0.0, 1.0), energy=(-1.5, 8.0, 0.0, 1.0)),
        speakers={f"s{i}": [i, "M", "ja"] for i in range(4)},
    )
    cfg.model.transformer.encoder_layer = 2
    cfg.model.transformer.decoder_layer = 2
    cfg.model.transformer.encoder_hidden = 64
    cfg.model.transformer.decoder_hidden = 64
    cfg.model.transformer.conv_filter_size = 128
    cfg.model.variance_predictor.filter_size = 64
    return cfg


def test_forward_parity_teacher_forced(ref_fastspeech2):
    import jax
    import jax.numpy as jnp

    from masg_tpu.compat.torch_fs2 import convert_torch_fastspeech2
    from masg_tpu.models import FastSpeech2

    ref, pre, mdl = ref_fastspeech2
    rng = np.random.default_rng(0)
    B, L = 2, 9
    texts = rng.integers(1, 100, size=(B, L)).astype(np.int64)
    src_lens = np.array([L, L - 2])
    texts[1, L - 2:] = 0
    accents = rng.integers(0, 5, size=(B, L)).astype(np.int64)
    durations = rng.integers(1, 4, size=(B, L)).astype(np.int64)
    durations[1, L - 2:] = 0
    mel_lens = durations.sum(1)
    T = int(mel_lens.max())
    mels = rng.normal(size=(B, T, 80)).astype(np.float32)
    pitches = rng.normal(size=(B, L)).astype(np.float32)
    energies = rng.normal(size=(B, L)).astype(np.float32)
    speakers = np.array([0, 2])
    meta = np.zeros((B, 4), np.float32)
    meta[:, 0] = 1.0
    meta[:, 2] = 1.0

    with torch.no_grad():
        (r_mel, r_post, r_p, r_e, r_logd, r_dr, r_smask, r_mmask, r_slen,
         r_mlen, r_gmm, r_semb) = ref(
            torch.from_numpy(speakers), torch.from_numpy(texts),
            torch.from_numpy(src_lens), L,
            torch.from_numpy(mels), torch.from_numpy(mel_lens), T,
            torch.from_numpy(pitches), torch.from_numpy(energies),
            torch.from_numpy(durations),
            accents=torch.from_numpy(accents),
            speaker_meta=torch.from_numpy(meta),
        )

    params, batch_stats = convert_torch_fastspeech2(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        encoder_layers=2, decoder_layers=2,
    )
    model = FastSpeech2.from_config(our_config())
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(speakers.astype(np.int32)), jnp.asarray(texts.astype(np.int32)),
        jnp.asarray(src_lens.astype(np.int32)), T,
        mels=jnp.asarray(mels), mel_lens=jnp.asarray(mel_lens.astype(np.int32)),
        p_targets=jnp.asarray(pitches), e_targets=jnp.asarray(energies),
        d_targets=jnp.asarray(durations.astype(np.int32)),
        accents=jnp.asarray(accents.astype(np.int32)),
        speaker_meta=jnp.asarray(meta),
    )

    np.testing.assert_allclose(np.asarray(out.mel), r_mel.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.postnet_mel), r_post.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out.pitch_prediction), r_p.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.energy_prediction), r_e.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.log_duration_prediction), r_logd.numpy(), atol=2e-4
    )
    # speaker embeddings + GMM prior parameters
    np.testing.assert_allclose(np.asarray(out.speaker_emb), r_semb.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.speaker_gmm.pi), r_gmm.mixture_distribution.probs.numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.speaker_gmm.mu),
        r_gmm.component_distribution.base_dist.loc.numpy(), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.speaker_gmm.sigma),
        r_gmm.component_distribution.base_dist.scale.numpy(), atol=1e-5,
    )


def test_free_running_parity(ref_fastspeech2):
    """Inference path: predicted durations drive the length regulator in both
    frameworks; compare predictions + expanded lengths."""
    import jax.numpy as jnp

    from masg_tpu.compat.torch_fs2 import convert_torch_fastspeech2
    from masg_tpu.models import FastSpeech2

    ref, pre, mdl = ref_fastspeech2
    rng = np.random.default_rng(1)
    B, L = 2, 7
    texts = rng.integers(1, 100, size=(B, L)).astype(np.int64)
    src_lens = np.array([L, L])
    accents = rng.integers(0, 5, size=(B, L)).astype(np.int64)
    speakers = np.array([1, 3])
    meta = np.zeros((B, 4), np.float32)

    with torch.no_grad():
        r = ref(
            torch.from_numpy(speakers), torch.from_numpy(texts),
            torch.from_numpy(src_lens), L,
            accents=torch.from_numpy(accents),
            speaker_meta=torch.from_numpy(meta),
        )
    r_post, r_logd, r_dr, r_mlen = r[1], r[4], r[5], r[9]

    params, batch_stats = convert_torch_fastspeech2(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        encoder_layers=2, decoder_layers=2,
    )
    model = FastSpeech2.from_config(our_config())
    T = int(r_post.shape[1])
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(speakers.astype(np.int32)), jnp.asarray(texts.astype(np.int32)),
        jnp.asarray(src_lens.astype(np.int32)), max(T, 1),
        accents=jnp.asarray(accents.astype(np.int32)),
        speaker_meta=jnp.asarray(meta),
    )
    np.testing.assert_allclose(
        np.asarray(out.log_duration_prediction), r_logd.numpy(), atol=2e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out.duration_rounded), r_dr.numpy()
    )
    np.testing.assert_array_equal(np.asarray(out.mel_len), r_mlen.numpy())
    if T > 0:
        np.testing.assert_allclose(
            np.asarray(out.postnet_mel)[:, :T], r_post.numpy(), atol=3e-4
        )


@pytest.mark.slow
def test_full_size_forward_parity(ref_fastspeech2, tmp_path_factory):
    """Same parity check at the real 35M configuration (4+6 layers, 256
    hidden, 1024 FFN)."""
    import importlib
    import jax.numpy as jnp

    from masg_tpu.compat.torch_fs2 import convert_torch_fastspeech2
    from masg_tpu.models import FastSpeech2

    fs2_mod = importlib.import_module("refmodel.fastspeech2")
    tmp = str(tmp_path_factory.mktemp("refcfg_full"))
    with open(os.path.join(tmp, "speakers.json"), "w") as f:
        json.dump({f"s{i}": [i, "M", "ja"] for i in range(8)}, f)
    with open(os.path.join(tmp, "stats.json"), "w") as f:
        json.dump({"pitch": [-2, 9, 0, 1], "energy": [-1.5, 8, 0, 1]}, f)
    pre = {
        "mel": {"n_mel_channels": 80},
        "pitch": {"feature": "phoneme_level"},
        "energy": {"feature": "phoneme_level"},
        "speaker_generation": {"metadata": {"gender": {"M": 0, "F": 1},
                                            "language": {"ja": 0, "en": 1}}},
    }
    mdl = {
        "transformer": {"encoder_layer": 4, "encoder_head": 2, "encoder_hidden": 256,
                        "decoder_layer": 6, "decoder_head": 2, "decoder_hidden": 256,
                        "conv_filter_size": 1024, "conv_kernel_size": [9, 1],
                        "encoder_dropout": 0.2, "decoder_dropout": 0.2},
        "variance_predictor": {"filter_size": 256, "kernel_size": 3, "dropout": 0.5},
        "variance_embedding": {"pitch_quantization": "linear",
                               "energy_quantization": "linear", "n_bins": 256},
        "jdit": {"use_jdit": False},
        "multi_speaker": True,
        "max_seq_len": 1000,
        "speaker_generation": {"GMM_mixtures": 3},
    }
    torch.manual_seed(1)
    ref = fs2_mod.FastSpeech2(pre, mdl, tmp)
    ref.eval()

    rng = np.random.default_rng(4)
    B, L = 2, 24
    texts = rng.integers(1, 400, size=(B, L)).astype(np.int64)
    src_lens = np.array([L, L - 5])
    texts[1, L - 5:] = 0
    accents = rng.integers(0, 5, size=(B, L)).astype(np.int64)
    durations = rng.integers(1, 6, size=(B, L)).astype(np.int64)
    durations[1, L - 5:] = 0
    mel_lens = durations.sum(1)
    T = int(mel_lens.max())
    mels = rng.normal(size=(B, T, 80)).astype(np.float32)
    pitches = rng.normal(size=(B, L)).astype(np.float32)
    energies = rng.normal(size=(B, L)).astype(np.float32)
    speakers = np.array([0, 7])
    meta = np.zeros((B, 4), np.float32); meta[:, 1] = 1; meta[:, 3] = 1

    with torch.no_grad():
        r = ref(torch.from_numpy(speakers), torch.from_numpy(texts),
                torch.from_numpy(src_lens), L,
                torch.from_numpy(mels), torch.from_numpy(mel_lens), T,
                torch.from_numpy(pitches), torch.from_numpy(energies),
                torch.from_numpy(durations),
                accents=torch.from_numpy(accents),
                speaker_meta=torch.from_numpy(meta))

    params, batch_stats = convert_torch_fastspeech2(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        encoder_layers=4, decoder_layers=6,
    )
    from masg_tpu.core.config import (ExperimentConfig, ModelConfig,
                                      PreprocessConfig, Stats, TrainConfig)

    cfg = ExperimentConfig(
        preprocess=PreprocessConfig(), model=ModelConfig(), train=TrainConfig(),
        stats=Stats(pitch=(-2.0, 9.0, 0.0, 1.0), energy=(-1.5, 8.0, 0.0, 1.0)),
        speakers={f"s{i}": [i, "M", "ja"] for i in range(8)},
    )
    model = FastSpeech2.from_config(cfg)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(speakers.astype(np.int32)), jnp.asarray(texts.astype(np.int32)),
        jnp.asarray(src_lens.astype(np.int32)), T,
        mels=jnp.asarray(mels), mel_lens=jnp.asarray(mel_lens.astype(np.int32)),
        p_targets=jnp.asarray(pitches), e_targets=jnp.asarray(energies),
        d_targets=jnp.asarray(durations.astype(np.int32)),
        accents=jnp.asarray(accents.astype(np.int32)), speaker_meta=jnp.asarray(meta),
    )
    np.testing.assert_allclose(np.asarray(out.postnet_mel), r[1].numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.mel), r[0].numpy(), atol=5e-4)


def test_jdit_forward_parity(ref_fastspeech2, monkeypatch):
    """The Tacotron2 JDIT teacher (reference model/jdit.py:238-520): converted
    weights, teacher-forced decode, dropout disabled on both sides -> mel,
    gate, and alignment trajectories must match in f64. (The module is
    runnable even though the reference's jdit TRAINING loss indexing is not —
    see test_torch_train_parity.py's jdit trajectory test.)"""
    import importlib

    import flax.linen as fnn
    import jax
    import jax.numpy as jnp

    from masg_tpu.compat.torch_fs2 import convert_torch_jdit
    from masg_tpu.models.jdit import JDIT

    jdit_mod = importlib.import_module("refmodel.jdit")
    # prenet hardcodes F.dropout(training=True) (jdit.py:130) — kill dropout
    # everywhere so the comparison is deterministic
    monkeypatch.setattr(
        torch.nn.functional, "dropout",
        lambda x, p=0.5, training=False, inplace=False: x,
    )
    # REFERENCE BUG, corrected for this comparison: Decoder.forward applies
    # `mask=~get_mask_from_lengths(...)` (jdit.py:437-438) assuming the
    # NVIDIA Tacotron2 convention (True at VALID frames), but the vendored
    # utils.tools.get_mask_from_lengths returns True at PADS — as written
    # the teacher attends ONLY to padding and NaNs on full-length items
    # (softmax over all -inf). Flip the convention so the torch side
    # expresses the evident intent; our models/jdit.py masks pads directly.
    # Idempotent permanent patch shared with test_torch_train_parity's
    # trajectory helper (refmodel.jdit is a process-wide singleton — a
    # per-test monkeypatch would double-invert when both files run).
    if not getattr(jdit_mod, "_mask_fixed", False):
        orig_mask_fn = jdit_mod.get_mask_from_lengths
        jdit_mod.get_mask_from_lengths = lambda lengths: ~orig_mask_fn(lengths)
        jdit_mod._mask_fixed = True
    monkeypatch.setattr(
        fnn.Dropout, "__call__",
        # identity, not orig(deterministic=True): modules that set
        # deterministic in the CONSTRUCTOR (JDIT's always-on prenet) reject
        # a second call-time value
        lambda self, x, deterministic=None, rng=None: x,
    )

    B, L, T = 2, 7, 12
    pre = {"preprocessing": {"stft": {"hop_length": 256},
                             "audio": {"sampling_rate": 22050}}}
    torch.manual_seed(3)
    ref = jdit_mod.JDIT(model_config={}, preprocess_config=pre).double()
    ref.train()  # training-path decode (mask applied, dropout patched out)

    rng = np.random.default_rng(0)
    memory = rng.normal(size=(B, L, 256))
    mels = rng.normal(size=(B, T, 80))
    src_lens = np.array([L, L - 2], np.int64)

    with torch.no_grad():
        mel_t, gate_t, align_t = ref(
            torch.from_numpy(memory), torch.from_numpy(mels),
            torch.from_numpy(src_lens))

    sd = {"jdit." + k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_torch_jdit(sd)
    with jax.enable_x64(True):
        ours = JDIT(n_mels=80, encoder_dim=256, dtype=jnp.float64)
        pad_mask = jnp.arange(L)[None, :] >= jnp.asarray(src_lens)[:, None]
        mel_j, gate_j, align_j = ours.apply(
            {"params": params}, jnp.asarray(memory), jnp.asarray(mels),
            pad_mask, True)

    np.testing.assert_allclose(np.asarray(mel_j), mel_t.numpy(),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(gate_j), gate_t.numpy(),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(align_j), align_t.numpy(),
                               rtol=1e-8, atol=1e-9)


def test_forward_parity_frame_level(ref_fastspeech2, tmp_path_factory):
    del ref_fastspeech2  # fixture primes the refmodel package import
    """The reference's frame_level pitch/energy mode (preprocess.yaml
    'feature' — variance embeddings applied AFTER length regulation on
    per-FRAME targets, reference model/modules.py:96-120): teacher-forced
    forward must match with converted weights. All shipped configs use
    phoneme_level, so this closes the other documented mode."""
    import importlib

    import jax.numpy as jnp

    from masg_tpu.compat.torch_fs2 import convert_torch_fastspeech2
    from masg_tpu.models import FastSpeech2

    fs2_mod = importlib.import_module("refmodel.fastspeech2")
    tmp = str(tmp_path_factory.mktemp("framecfg"))
    with open(os.path.join(tmp, "speakers.json"), "w") as f:
        json.dump({f"s{i}": [i, "M", "ja"] for i in range(4)}, f)
    with open(os.path.join(tmp, "stats.json"), "w") as f:
        json.dump({"pitch": [-2, 9, 0, 1], "energy": [-1.5, 8, 0, 1]}, f)
    pre = {
        "mel": {"n_mel_channels": 80},
        "pitch": {"feature": "frame_level"},
        "energy": {"feature": "frame_level"},
        "speaker_generation": {"metadata": {"gender": {"M": 0, "F": 1},
                                            "language": {"ja": 0, "en": 1}}},
    }
    mdl = {
        "transformer": {"encoder_layer": 2, "encoder_head": 2,
                        "encoder_hidden": 64, "decoder_layer": 2,
                        "decoder_head": 2, "decoder_hidden": 64,
                        "conv_filter_size": 128, "conv_kernel_size": [9, 1],
                        "encoder_dropout": 0.2, "decoder_dropout": 0.2},
        "variance_predictor": {"filter_size": 64, "kernel_size": 3,
                               "dropout": 0.5},
        "variance_embedding": {"pitch_quantization": "linear",
                               "energy_quantization": "linear", "n_bins": 256},
        "jdit": {"use_jdit": False},
        "multi_speaker": True,
        "max_seq_len": 1000,
        "speaker_generation": {"GMM_mixtures": 3},
    }
    torch.manual_seed(0)
    ref = fs2_mod.FastSpeech2(pre, mdl, tmp)
    ref.eval()

    rng = np.random.default_rng(1)
    B, L = 2, 9
    texts = rng.integers(1, 100, size=(B, L)).astype(np.int64)
    src_lens = np.array([L, L - 2])
    texts[1, L - 2:] = 0
    accents = rng.integers(0, 5, size=(B, L)).astype(np.int64)
    durations = rng.integers(1, 4, size=(B, L)).astype(np.int64)
    durations[1, L - 2:] = 0
    mel_lens = durations.sum(1)
    T = int(mel_lens.max())
    mels = rng.normal(size=(B, T, 80)).astype(np.float32)
    # frame_level: targets are per mel FRAME, not per phoneme
    pitches = rng.normal(size=(B, T)).astype(np.float32)
    energies = rng.normal(size=(B, T)).astype(np.float32)
    speakers = np.array([0, 2])
    meta = np.zeros((B, 4), np.float32)
    meta[:, 0] = 1.0
    meta[:, 2] = 1.0

    with torch.no_grad():
        r = ref(
            torch.from_numpy(speakers), torch.from_numpy(texts),
            torch.from_numpy(src_lens), L,
            torch.from_numpy(mels), torch.from_numpy(mel_lens), T,
            torch.from_numpy(pitches), torch.from_numpy(energies),
            torch.from_numpy(durations),
            accents=torch.from_numpy(accents),
            speaker_meta=torch.from_numpy(meta),
        )

    params, batch_stats = convert_torch_fastspeech2(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        encoder_layers=2, decoder_layers=2,
    )
    cfg = our_config()
    cfg.preprocess.pitch.feature = "frame_level"
    cfg.preprocess.energy.feature = "frame_level"
    model = FastSpeech2.from_config(cfg)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(speakers.astype(np.int32)),
        jnp.asarray(texts.astype(np.int32)),
        jnp.asarray(src_lens.astype(np.int32)), T,
        mels=jnp.asarray(mels),
        mel_lens=jnp.asarray(mel_lens.astype(np.int32)),
        p_targets=jnp.asarray(pitches), e_targets=jnp.asarray(energies),
        d_targets=jnp.asarray(durations.astype(np.int32)),
        accents=jnp.asarray(accents.astype(np.int32)),
        speaker_meta=jnp.asarray(meta),
    )
    np.testing.assert_allclose(np.asarray(out.mel), r[0].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.postnet_mel), r[1].numpy(),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.pitch_prediction), r[2].numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.energy_prediction), r[3].numpy(),
                               atol=2e-4)

    # loss reductions: frame-level pitch/energy masked_select over MEL masks
    # (reference loss.py:55-62 frame branch) vs our mel_valid masked means
    from masg_tpu.models import fastspeech2_loss

    loss_mod = importlib.import_module("refmodel.loss")
    Loss = loss_mod.FastSpeech2Loss(pre, mdl)
    batch = (None, None, torch.from_numpy(speakers), torch.from_numpy(texts),
             torch.from_numpy(src_lens), L, torch.from_numpy(mels),
             torch.from_numpy(mel_lens), T, torch.from_numpy(pitches),
             torch.from_numpy(energies), torch.from_numpy(durations))
    with torch.no_grad():
        t_total, t_mel, t_post, t_pitch, t_energy, t_dur = Loss(batch, r[:-2])
    ours = fastspeech2_loss(
        out, jnp.asarray(mels), jnp.asarray(pitches), jnp.asarray(energies),
        jnp.asarray(durations.astype(np.int32)),
        pitch_feature_level="frame_level", energy_feature_level="frame_level")
    np.testing.assert_allclose(float(ours.pitch), float(t_pitch), atol=1e-4)
    np.testing.assert_allclose(float(ours.energy), float(t_energy), atol=1e-4)
    np.testing.assert_allclose(float(ours.total), float(t_total), atol=5e-4)
