"""Reference-format checkpoint export, self-contained: the canonical
parameter order and derived buffers are generated from config (no reference
code needed at export time) and validated here against the LIVE reference
model. The update-math side (Adam moments, trajectory continuity) is proven
in test_torch_train_parity.py::test_mid_training_migration_round_trip.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_train_parity import (_import_ref, _our_config,  # noqa: E402
                                     _ref_configs)


def _live_ref(tmp_path, use_jdit=False, multi_speaker=True, hidden=64):
    fs2_mod = _import_ref("fastspeech2")
    pre, mdl = _ref_configs(str(tmp_path), use_jdit=use_jdit, hidden=hidden)
    mdl["multi_speaker"] = multi_speaker
    torch.manual_seed(0)
    return fs2_mod.FastSpeech2(pre, mdl, str(tmp_path))


@pytest.mark.parametrize("use_jdit,multi_speaker", [
    (False, True), (True, True), (False, False), (True, False),
])
def test_reference_param_order_matches_live(tmp_path, use_jdit, multi_speaker):
    """torch Adam state_dicts key per-param state by position in
    named_parameters() — the generated order must match the live reference
    model exactly for every architecture variant."""
    from masg_tpu.compat.torch_fs2 import reference_param_order

    ref = _live_ref(tmp_path, use_jdit=use_jdit, multi_speaker=multi_speaker)
    live = [n for n, _ in ref.named_parameters()]
    ours = reference_param_order(2, 2, multi_speaker=multi_speaker,
                                 use_jdit=use_jdit)
    assert ours == live


def test_export_checkpoint_strict_loadable(tmp_path):
    """export_torch_checkpoint produces a state_dict the reference loads
    with strict=True — incl. recomputed position tables, pitch/energy bins
    (bit-equal to the reference's own), and BN bookkeeping buffers."""
    import jax

    from masg_tpu.compat.torch_fs2 import (convert_torch_fastspeech2,
                                           export_torch_checkpoint)
    from masg_tpu.models import FastSpeech2
    from masg_tpu.train.optim import make_optimizer
    from masg_tpu.train.state import create_train_state

    ref = _live_ref(tmp_path, use_jdit=True)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, batch_stats = convert_torch_fastspeech2(sd, 2, 2)

    cfg = _our_config(use_jdit=True)
    model = FastSpeech2.from_config(cfg)
    tx = make_optimizer(cfg.train.optimizer, 64, torch_lstm_bias_compat=True)
    state = create_train_state(
        model, {"params": params, "batch_stats": batch_stats}, tx)

    ckpt = export_torch_checkpoint(state.params, state.batch_stats, cfg,
                                   opt_state=state.opt_state)

    # strict load round-trips into the live reference model
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)).to(ref.state_dict()[k].dtype)
         for k, v in ckpt["model"].items()})  # strict=True default
    for k, v in ref.state_dict().items():
        np.testing.assert_array_equal(
            np.asarray(ckpt["model"][k], v.numpy().dtype), v.numpy(),
            err_msg=k)

    # recomputed buffers are bit-equal to the reference's own derivations
    orig = _live_ref(tmp_path, use_jdit=True).state_dict()
    for k in ("encoder.position_enc", "decoder.position_enc",
              "variance_adaptor.pitch_bins", "variance_adaptor.energy_bins"):
        np.testing.assert_array_equal(
            np.asarray(ckpt["model"][k], np.float32), orig[k].numpy(),
            err_msg=k)

    # the optimizer dict is accepted by a fresh torch Adam over the live
    # reference params and it can step (the trajectory math is proven in the
    # migration round-trip test)
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    opt.load_state_dict(ckpt["optimizer"])
    # a fresh state has count 0 on every entry
    jax.tree.map(lambda x: x, state.opt_state)  # keep x64-independent
    assert all(int(s["step"]) == 0 for s in ckpt["optimizer"]["state"].values())


def test_cli_checkpoint_round_trip(tmp_path):
    """convert_checkpoint CLI both ways: train a few steps on a synthetic
    corpus, export --to_torch (full {"model","optimizer"} .pth.tar), import
    it back with --torch_ckpt, and check weights AND Adam moments survive
    the round trip."""
    import os

    import jax
    from fixtures import make_config_dir, make_synthetic_corpus

    tmp = str(tmp_path)
    raw, pre, _ = make_synthetic_corpus(tmp, n_speakers=2, utts_per_speaker=6)
    cfg_dir = make_config_dir(tmp, pre, tmp)

    from masg_tpu.cli.preprocess import main as preprocess_main

    preprocess_main(["--config", cfg_dir])
    import shutil

    shutil.copy(os.path.join(pre, "stats.json"), os.path.join(cfg_dir, "stats.json"))
    shutil.copy(os.path.join(pre, "speakers.json"), os.path.join(cfg_dir, "speakers.json"))

    from masg_tpu.cli.train import main as train_main

    train_main(["-c", cfg_dir, "--max_steps", "10"])

    from masg_tpu.cli.convert_checkpoint import main as convert_main

    pth = os.path.join(tmp, "export", "10.pth.tar")
    convert_main(["-c", cfg_dir, "--step", "10", "--to_torch", pth])
    assert os.path.exists(pth)

    ckpt = torch.load(pth, map_location="cpu", weights_only=True)
    assert "model" in ckpt and "optimizer" in ckpt
    some_state = next(iter(ckpt["optimizer"]["state"].values()))
    assert int(some_state["step"]) == 10

    # import back into a fresh ckpt dir and compare trees
    back_dir = os.path.join(tmp, "back")
    convert_main(["-c", cfg_dir, "--step", "10",
                  "--torch_ckpt", pth, "--out", back_dir])

    from masg_tpu.core.checkpoint import CheckpointManager
    from masg_tpu.core.config import load_config_dir
    from masg_tpu.infer.synthesis import load_model
    from masg_tpu.train.optim import make_optimizer
    from masg_tpu.train.state import create_train_state

    cfg = load_config_dir(cfg_dir)
    model, variables = load_model(cfg, restore_step=0)
    tx = make_optimizer(cfg.train.optimizer, cfg.model.transformer.encoder_hidden)
    template = create_train_state(model, variables, tx)
    orig = CheckpointManager(cfg.train.path.ckpt_path).restore(10, template)
    back = CheckpointManager(back_dir).restore(10, template)

    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
                 orig.params, back.params)
    from masg_tpu.compat.torch_fs2 import _find_adam_state

    ai, si = _find_adam_state(orig.opt_state)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7),
                 orig.opt_state[ai].mu, back.opt_state[ai].mu)
    assert int(back.opt_state[ai].count) == 10
    if si is not None:
        assert int(back.opt_state[si].count) == 10


def test_cli_ganlike_checkpoint_round_trip(tmp_path):
    """--ganlike conversion both ways: train the adversarial variant, export
    the {"model","discriminator","optimizer"} .pth.tar, import it back, and
    check both halves' weights plus the joint Adam moments survive."""
    import os
    import shutil

    import jax
    from fixtures import make_config_dir, make_synthetic_corpus

    tmp = str(tmp_path)
    raw, pre, _ = make_synthetic_corpus(tmp, n_speakers=2, utts_per_speaker=6)
    cfg_dir = make_config_dir(tmp, pre, tmp)

    from masg_tpu.cli.preprocess import main as preprocess_main

    preprocess_main(["--config", cfg_dir])
    shutil.copy(os.path.join(pre, "stats.json"), os.path.join(cfg_dir, "stats.json"))
    shutil.copy(os.path.join(pre, "speakers.json"), os.path.join(cfg_dir, "speakers.json"))

    from masg_tpu.cli.train_ganlike import main as gan_main

    gan_main(["-c", cfg_dir, "--max_steps", "10"])

    from masg_tpu.cli.convert_checkpoint import main as convert_main

    pth = os.path.join(tmp, "export", "10.pth.tar")
    convert_main(["-c", cfg_dir, "--step", "10", "--to_torch", pth,
                  "--ganlike"])
    ckpt = torch.load(pth, map_location="cpu", weights_only=True)
    assert set(ckpt) == {"model", "discriminator", "optimizer"}

    back_dir = os.path.join(tmp, "back")
    convert_main(["-c", cfg_dir, "--step", "10", "--torch_ckpt", pth,
                  "--out", back_dir, "--ganlike"])

    from masg_tpu.compat.torch_fs2 import _find_adam_state
    from masg_tpu.core.checkpoint import CheckpointManager
    from masg_tpu.core.config import load_config_dir
    from masg_tpu.infer.synthesis import load_model
    from masg_tpu.models.speaker_encoder import SpeechEmbedder
    from masg_tpu.train.optim import make_optimizer
    from masg_tpu.train.state import create_train_state

    cfg = load_config_dir(cfg_dir)
    model, variables = load_model(cfg, restore_step=0)
    disc = SpeechEmbedder(n_mels=cfg.preprocess.mel.n_mel_channels,
                          hidden=cfg.model.discriminator.hidden)
    disc_params = disc.init(jax.random.PRNGKey(0),
                            np.zeros((2, 150, 80), np.float32))["params"]
    tx = make_optimizer(cfg.train.optimizer,
                        cfg.model.transformer.encoder_hidden,
                        clip_subtree="model", torch_lstm_bias_compat=True)
    template = create_train_state(model, {
        "params": {"model": variables["params"], "discriminator": disc_params},
        "batch_stats": variables.get("batch_stats", {}),
    }, tx)
    orig = CheckpointManager(cfg.train.path.ckpt_path).restore(10, template)
    back = CheckpointManager(back_dir).restore(10, template)

    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
                 orig.params, back.params)
    ai, _ = _find_adam_state(orig.opt_state)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
                 orig.opt_state[ai].mu, back.opt_state[ai].mu)
    assert int(back.opt_state[ai].count) == 10
