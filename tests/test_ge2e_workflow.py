"""The reference's TWO-STAGE GE2E workflow, end to end: pretrain the speaker
encoder (stage 1, reference Multilingual-.../train_speech_embedder.py) ->
checkpoint -> load it as the frozen language discriminator for --use_clf TTS
training (stage 2, reference train.py:74-91 +
config/JVS-VCTK_langemb_configs/JVS-VCTK_1/train.yaml:6 discriminator_path).

Covers both checkpoint formats discriminator_path accepts: our orbax layout
(from train_speaker_encoder) and the reference's torch {'embedder_net': ...}
dict (train_speech_embedder.py:218-222).
"""

import os
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_config_dir, make_synthetic_corpus


@pytest.fixture(scope="module")
def chunks_dir(tmp_path_factory):
    """Synthetic GE2E chunk corpus: 4 speakers x 2 langs, 80-mel 150-frame
    chunks (the shape the FS2 adversarial branch feeds the discriminator,
    reference train.py:181-184)."""
    tmp = tmp_path_factory.mktemp("ge2e_chunks")
    rng = np.random.default_rng(0)
    for s in range(4):
        lang = "ja" if s < 2 else "en"
        # archive layout is (n_chunks, n_mels, frames) — the reference GE2E
        # data prep's on-disk format (data_preprocess.py)
        base = rng.normal(size=(80, 150)) * 0.5
        chunks = (base[None] + 0.1 * rng.normal(size=(6, 80, 150))).astype(
            np.float32)
        np.save(tmp / f"synth_spk{s}_M_{lang}.npy", chunks)
    return str(tmp)


@pytest.fixture(scope="module")
def fs2_experiment(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("ge2e_wf"))
    _, pre, _ = make_synthetic_corpus(tmp, n_speakers=2, utts_per_speaker=6)
    return tmp, pre


def _config(tmp, pre, sub, **kwargs):
    from masg_tpu.cli.preprocess import main as preprocess_main

    run = os.path.join(tmp, sub)
    os.makedirs(run, exist_ok=True)
    cfg_dir = make_config_dir(tmp, pre, run, batch_size=4, group_size=1,
                              total_step=100, log_step=100, val_step=10**9,
                              save_step=10**9, synth_step=10**9, **kwargs)
    if not os.path.exists(os.path.join(pre, "stats.json")):
        preprocess_main(["--config", cfg_dir])
    shutil.copy(os.path.join(pre, "stats.json"),
                os.path.join(cfg_dir, "stats.json"))
    shutil.copy(os.path.join(pre, "speakers.json"),
                os.path.join(cfg_dir, "speakers.json"))
    return run, cfg_dir


def test_two_stage_workflow_orbax(chunks_dir, fs2_experiment, tmp_path):
    """Stage 1 trains + checkpoints the speaker encoder; stage 2's
    --use_clf trainer consumes the checkpoint via discriminator_path, and
    the loaded params ARE the stage-1 params (not a random init)."""
    import orbax.checkpoint as ocp

    from masg_tpu.core.config import load_config_dir
    from masg_tpu.train.ge2e import train_speaker_encoder
    from masg_tpu.train.loop import build_experiment

    enc_dir = str(tmp_path / "spk_enc")
    state = train_speaker_encoder(
        data_path=chunks_dir, datasets=["SYNTH"], out_dir=enc_dir,
        n_speakers=4, m_utts=3, epochs=1, batches_per_epoch=2,
        checkpoint_interval=10**9, verbose=False, n_devices=1)

    tmp, pre = fs2_experiment
    _, cfg_dir = _config(tmp, pre, "orbax_run")
    cfg = load_config_dir(cfg_dir)
    cfg.train.discriminator_path = enc_dir

    trainer = build_experiment(cfg, use_clf=True, n_devices=1)
    # the frozen discriminator is the stage-1 training result
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(trainer_disc_params(trainer)),
        jax.tree_util.tree_leaves_with_path(state.embedder_params),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    # stage 2 trains: the adversarial dloss is live (non-zero) under the
    # loaded discriminator
    group = next(iter(trainer.train_loader))
    batch = group[0]
    sub = jax.random.fold_in(trainer.rng, 1)
    # the step donates the state buffers — reassign or fit() would execute
    # on deleted buffers
    trainer.state, metrics = trainer.train_step_fn(
        trainer.state, trainer._place_batch(batch),
        np.asarray(jax.random.key_data(sub)))
    assert float(metrics.dloss) > 0.0
    assert np.isfinite(float(metrics.total))

    trainer.fit(max_steps=2, verbose=False)


def trainer_disc_params(trainer):
    # Trainer keeps the frozen params on the step closure; build_experiment
    # also hands them back on the instance for introspection
    return trainer.discriminator_params


def test_two_stage_workflow_torch_format(chunks_dir, fs2_experiment, tmp_path):
    """discriminator_path pointing at the reference's torch
    {'embedder_net': state_dict} checkpoint loads through weight conversion
    (reference train.py:80-84)."""
    torch = pytest.importorskip("torch")

    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_torch_train_parity import _import_ref_ge2e

    from masg_tpu.core.config import load_config_dir
    from masg_tpu.models.speaker_encoder import SpeechEmbedder
    from masg_tpu.train.loop import build_experiment, convert_torch_ge2e

    net_mod = _import_ref_ge2e(hidden=256, num_layer=3, proj=64)  # production size
    torch.manual_seed(7)
    net = net_mod.SpeechEmbedder()
    ckpt_path = str(tmp_path / "embedder.pth")
    torch.save({"embedder_net": net.state_dict(), "ge2e": {}}, ckpt_path)

    tmp, pre = fs2_experiment
    _, cfg_dir = _config(tmp, pre, "torch_run")
    cfg = load_config_dir(cfg_dir)
    cfg.train.discriminator_path = ckpt_path

    trainer = build_experiment(cfg, use_clf=True, n_devices=1)
    expect = convert_torch_ge2e(
        {k: v.numpy() for k, v in net.state_dict().items()},
        SpeechEmbedder(n_mels=80))
    got = dict(jax.tree_util.tree_leaves_with_path(trainer.discriminator_params))
    for path, leaf in jax.tree_util.tree_leaves_with_path(expect):
        np.testing.assert_array_equal(np.asarray(got[path]), np.asarray(leaf))

    trainer.fit(max_steps=2, verbose=False)


def test_missing_discriminator_path_is_an_error(fs2_experiment):
    """A configured-but-absent discriminator_path must fail loudly, never
    silently train against a random discriminator."""
    from masg_tpu.core.config import load_config_dir
    from masg_tpu.train.loop import build_experiment

    tmp, pre = fs2_experiment
    _, cfg_dir = _config(tmp, pre, "missing_run")
    cfg = load_config_dir(cfg_dir)
    cfg.train.discriminator_path = os.path.join(tmp, "nope.pth")
    with pytest.raises(FileNotFoundError):
        build_experiment(cfg, use_clf=True, n_devices=1)


def test_fused_epoch_matches_per_batch_loop(chunks_dir, tmp_path):
    """The single-device fast path (one lax.scan dispatch per epoch) is the
    SAME trajectory as the per-batch loop — identical key derivation and
    step closure, only the dispatch granularity differs."""
    from masg_tpu.train.ge2e import train_speaker_encoder

    kwargs = dict(
        data_path=chunks_dir, datasets=["SYNTH"], n_speakers=4, m_utts=3,
        epochs=2, batches_per_epoch=2, checkpoint_interval=10**9,
        verbose=False, n_devices=1, seed=11, da_startpoint=1.0)
    s_loop = train_speaker_encoder(
        out_dir=str(tmp_path / "loop"), fused_epoch=False, **kwargs)
    s_fused = train_speaker_encoder(
        out_dir=str(tmp_path / "fused"), fused_epoch=True, **kwargs)
    for a, b in zip(jax.tree_util.tree_leaves(s_loop.embedder_params),
                    jax.tree_util.tree_leaves(s_fused.embedder_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
