"""Production trainer on a multi-device mesh.

VERDICT r1 item 1: cli/train.py over the 8-device virtual CPU mesh must train
the synthetic corpus to the same losses as single-device, and sharded
TrainState must round-trip through the orbax checkpoint manager.
"""

import os
import re
import shutil

import numpy as np
import pytest

from fixtures import make_config_dir, make_synthetic_corpus


def _losses(log_path):
    """log.txt -> {step: [total, mel, postnet, pitch, energy, duration]}."""
    rows = {}
    pat = re.compile(
        r"Step (\d+)/\d+, Total Loss: ([\d.]+), Mel Loss: ([\d.]+), "
        r"Mel PostNet Loss: ([\d.]+), Pitch Loss: ([\d.]+), "
        r"Energy Loss: ([\d.]+), Duration Loss: ([\d.]+)"
    )
    for m in pat.finditer(open(log_path).read()):
        rows[int(m.group(1))] = [float(m.group(i)) for i in range(2, 8)]
    return rows


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("mesh"))
    _, pre, _ = make_synthetic_corpus(tmp, n_speakers=2, utts_per_speaker=8)
    return tmp, pre


def _experiment(tmp, pre, sub, **kwargs):
    """Per-run config dir + preprocessed stats (shared corpus)."""
    import random

    from masg_tpu.cli.preprocess import main as preprocess_main

    run = os.path.join(tmp, sub)
    os.makedirs(run, exist_ok=True)
    cfg_dir = make_config_dir(tmp, pre, run, batch_size=8, group_size=1,
                              total_step=6, log_step=1, val_step=10**9,
                              save_step=2, synth_step=10**9, **kwargs)
    if not os.path.exists(os.path.join(pre, "stats.json")):
        # the preprocessor's split shuffle is unseeded by design (reference
        # preprocessor.py:149-165 parity); seed it HERE so this module's
        # batch composition — and therefore its float-noise amplification —
        # is identical on every run instead of a per-process lottery
        random.seed(0)
        preprocess_main(["--config", cfg_dir])
    shutil.copy(os.path.join(pre, "stats.json"), os.path.join(cfg_dir, "stats.json"))
    shutil.copy(os.path.join(pre, "speakers.json"),
                os.path.join(cfg_dir, "speakers.json"))
    return run, cfg_dir


def _assert_trajectories_close(got, ref, rtol_first=1e-3, rtol_later=2e-2):
    """Equivalence with amplification-aware tolerances.

    Changing the mesh only reorders f32 reductions (the gradient psum), so
    per-step gradients agree to ~1e-7 rel — but Adam's 1/sqrt(v) is chaotic
    in early training and AMPLIFIES that noise multiplicatively per update:
    a full-suite run was once observed at 1.4e-2 rel by step 6 (energy loss)
    on an unlucky batch composition while bit-equal-to-4-decimals on another.
    Runs are therefore kept to 4 optimizer updates with per-step logging:
    step 1 — where real sharding bugs live (a missing psum mean shows up at
    ~1e-1 immediately) — is compared BEFORE any Adam amplification at a tight
    rtol, and the bounded later steps hold 2e-2 instead of the 5e-2 a
    6-update run needed."""
    assert set(got) == set(ref), (sorted(got), sorted(ref))
    steps = sorted(ref)
    for i, step in enumerate(steps):
        rtol = rtol_first if i == 0 else rtol_later
        np.testing.assert_allclose(got[step], ref[step], rtol=rtol,
                                   atol=2e-4, err_msg=f"step {step}")


def test_dp_mesh_matches_single_device(corpus):
    tmp, pre = corpus
    from masg_tpu.cli.train import main as train_main

    run1, cfg1 = _experiment(tmp, pre, "single")
    train_main(["-c", cfg1, "--max_steps", "4", "--n_devices", "1"])
    ref = _losses(os.path.join(run1, "out/log/train/log.txt"))
    assert ref, "single-device run logged no losses"

    run8, cfg8 = _experiment(tmp, pre, "mesh8")
    train_main(["-c", cfg8, "--max_steps", "4"])  # all 8 virtual devices
    got = _losses(os.path.join(run8, "out/log/train/log.txt"))

    _assert_trajectories_close(got, ref)


def test_tp_mesh_matches_single_device(corpus):
    """4x2 (data, model) mesh: Megatron-style tensor parallel in the
    production trainer agrees with single-device."""
    tmp, pre = corpus
    from masg_tpu.cli.train import main as train_main

    run1, cfg1 = _experiment(tmp, pre, "single")  # reuses the run above if present
    if not os.path.exists(os.path.join(run1, "out/log/train/log.txt")):
        train_main(["-c", cfg1, "--max_steps", "4", "--n_devices", "1"])
    ref = _losses(os.path.join(run1, "out/log/train/log.txt"))

    runtp, cfgtp = _experiment(tmp, pre, "meshtp")
    train_main(["-c", cfgtp, "--max_steps", "4", "--n_model", "2"])
    got = _losses(os.path.join(runtp, "out/log/train/log.txt"))

    _assert_trajectories_close(got, ref, rtol_first=5e-3)


def test_sharded_checkpoint_resume_exact(corpus):
    """Deterministic resume: the loader's shuffle is a pure function of
    (seed, epoch) and the per-step rng is fold_in(seed, step), so a run
    restored at step 2 must replay steps 3-4 of the uninterrupted mesh run
    EXACTLY (same topology, same graph, bit-identical checkpoint)."""
    tmp, pre = corpus
    from masg_tpu.cli.train import main as train_main

    run8, cfg8 = _experiment(tmp, pre, "mesh8")  # reuses the dp run if present
    if not os.path.exists(os.path.join(run8, "out/log/train/log.txt")):
        train_main(["-c", cfg8, "--max_steps", "4"])
    full = _losses(os.path.join(run8, "out/log/train/log.txt"))

    runr, cfgr = _experiment(tmp, pre, "resume")
    train_main(["-c", cfgr, "--max_steps", "2"])  # saves at step 2
    train_main(["-c", cfgr, "--restore_step", "2", "--max_steps", "2"])
    got = _losses(os.path.join(runr, "out/log/train/log.txt"))

    assert set(got) == set(full), (got.keys(), full.keys())
    for step in full:  # pre-restore prefix AND post-restore continuation
        np.testing.assert_allclose(got[step], full[step], rtol=1e-6,
                                   err_msg=f"step {step}")


def test_checkpoint_restores_across_topologies(corpus):
    """Checkpoint portability (reference restore-anywhere semantics,
    utils/model.py:15-28): a checkpoint saved on the 8-device dp mesh
    restores onto 1 device and onto a 4x2 (data, model) mesh, and training
    continues with the same losses as the uninterrupted mesh run."""
    tmp, pre = corpus
    from masg_tpu.cli.train import main as train_main

    run8, cfg8 = _experiment(tmp, pre, "mesh8")
    if not os.path.exists(os.path.join(run8, "out/log/train/log.txt")):
        train_main(["-c", cfg8, "--max_steps", "4"])
    full = _losses(os.path.join(run8, "out/log/train/log.txt"))

    runr, cfgr = _experiment(tmp, pre, "resume")  # mesh8 ckpt at step 2
    if not os.path.exists(os.path.join(runr, "out/ckpt")):
        train_main(["-c", cfgr, "--max_steps", "2"])

    # mesh8 -> 1 device
    run1, cfg1r = _experiment(tmp, pre, "resume")  # same run dir/ckpt
    train_main(["-c", cfg1r, "--restore_step", "2", "--max_steps", "2",
                "--n_devices", "1"])
    got1 = _losses(os.path.join(run1, "out/log/train/log.txt"))
    # step 3 = one update after restore (tight); step 4 sees the chaotic
    # f32 amplification documented on _assert_trajectories_close
    for step, rtol in ((3, 2e-3), (4, 2e-2)):
        if step in full and step in got1:
            np.testing.assert_allclose(got1[step], full[step], rtol=rtol,
                                       atol=2e-4, err_msg=f"1-dev step {step}")
    assert 4 in got1, got1

    # mesh8 -> 4x2 (data, model)
    train_main(["-c", cfg1r, "--restore_step", "2", "--max_steps", "2",
                "--n_model", "2"])
    got_tp = _losses(os.path.join(run1, "out/log/train/log.txt"))
    for step, rtol in ((3, 5e-3), (4, 2e-2)):
        if step in full and step in got_tp:
            np.testing.assert_allclose(got_tp[step], full[step], rtol=rtol,
                                       atol=5e-4, err_msg=f"4x2 step {step}")
