"""Full-stack smoke: synthetic corpus -> preprocess CLI -> train CLI (few
steps + checkpoint) -> speaker_gen CLI -> synthesize CLI -> wav on disk."""

import json
import os
import sys

import numpy as np
import pytest
import yaml

from fixtures import make_config_dir, make_synthetic_corpus


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("e2e"))
    raw, pre, _ = make_synthetic_corpus(tmp, n_speakers=2, utts_per_speaker=6)
    cfg_dir = make_config_dir(tmp, pre, tmp)

    from masg_tpu.cli.preprocess import main as preprocess_main

    preprocess_main(["--config", cfg_dir])

    # single corpus: copy its stats into the config dir (gather is for multi)
    import shutil

    shutil.copy(os.path.join(pre, "stats.json"), os.path.join(cfg_dir, "stats.json"))
    shutil.copy(os.path.join(pre, "speakers.json"), os.path.join(cfg_dir, "speakers.json"))
    return tmp, cfg_dir, pre


def test_train_cli_runs_and_checkpoints(experiment):
    tmp, cfg_dir, pre = experiment
    from masg_tpu.cli.train import main as train_main

    train_main(["-c", cfg_dir, "--max_steps", "20"])
    # checkpoints at step 10 and 20
    ckpts = os.listdir(os.path.join(tmp, "out/ckpt"))
    assert any("10" in c for c in ckpts) and any("20" in c for c in ckpts)
    log = open(os.path.join(tmp, "out/log/train/log.txt")).read()
    assert "Step 20/20" in log
    # validation ran
    assert os.path.exists(os.path.join(tmp, "out/log/val/log.txt"))


def test_speaker_gen_and_synthesis_cli(experiment):
    tmp, cfg_dir, pre = experiment
    from masg_tpu.cli.speaker_gen import main as spk_main
    from masg_tpu.cli.synthesize import main as synth_main
    from masg_tpu.cli.synthesize_from_speaker import main as sfs_main

    emb_path = os.path.join(tmp, "gen_speaker.npy")
    spk_main(["-c", cfg_dir, "-r", "20", "--gender", "F", "--language", "ja",
              "-o", emb_path])
    emb = np.load(emb_path)
    assert emb.shape == (64,) and np.isfinite(emb).all()
    # deterministic under the same seed
    emb_path2 = os.path.join(tmp, "gen_speaker2.npy")
    spk_main(["-c", cfg_dir, "-r", "20", "--gender", "F", "--language", "ja",
              "-o", emb_path2, "--seed", "0"])
    np.testing.assert_array_equal(emb, np.load(emb_path2))

    result = os.path.join(tmp, "result")
    synth_main(["-c", cfg_dir, "-r", "20", "--phones", "{a i u e o}",
                "--result_path", result, "--no_vocoder"])
    # untrained-ish model may emit 0 frames; png may be skipped but no crash
    sfs_main(["-c", cfg_dir, "-r", "20", "--phones", "{a i u e o}",
              "-s", emb_path, "--result_path", result, "--no_vocoder"])


def test_synthesize_with_vocoder(experiment):
    tmp, cfg_dir, pre = experiment
    from masg_tpu.cli.synthesize import main as synth_main

    result = os.path.join(tmp, "result_voc")
    synth_main(["-c", cfg_dir, "-r", "20", "--phones", "{a i u e o a i u e o}",
                "--duration_control", "8.0", "--result_path", result])
    wavs = [f for f in os.listdir(result) if f.endswith(".wav")]
    if wavs:  # durations may round to zero on a 20-step model
        from masg_tpu.audio.wavio import read_wav

        wav, sr = read_wav(os.path.join(result, wavs[0]))
        assert sr == 22050


def test_generation_clis(experiment):
    """examples_gen + build_distribution + examples_gen_distri end-to-end."""
    tmp, cfg_dir, pre = experiment
    from masg_tpu.cli.build_distribution import main as bd_main
    from masg_tpu.cli.examples_gen import main as eg_main
    from masg_tpu.cli.examples_gen_distri import main as egd_main

    out1 = os.path.join(tmp, "examples")
    eg_main(["-c", cfg_dir, "-r", "0", "--output_path", out1, "--no_vocoder",
             "--max_real_speakers", "1"])
    npys = [f for f in os.listdir(out1) if f.endswith(".npy")]
    # 1 real speaker + 4 corners x n_new(=1 speaker at 2 speakers total... >=4)
    assert len(npys) >= 5, npys

    dist_path = os.path.join(tmp, "neutral.npz")
    bd_main(["-c", cfg_dir, "--mode", "barycenter", "-o", dist_path])
    z = np.load(dist_path)
    assert z["mu"].shape[-1] == 64 and z["pi"].shape[-1] >= 1

    dist_path2 = os.path.join(tmp, "interp.npz")
    bd_main(["-c", cfg_dir, "--mode", "interpolate", "--t", "0.5",
             "-o", dist_path2])
    z2 = np.load(dist_path2)
    assert z2["pi"].shape[-1] == 9  # 3x3 component product

    out2 = os.path.join(tmp, "distri_examples")
    egd_main(["-c", cfg_dir, "-r", "0", "-d", dist_path, "--n_speakers", "3",
              "--output_path", out2, "--no_vocoder"])
    assert len([f for f in os.listdir(out2) if f.endswith(".npy")]) == 3


def test_train_clf_and_ganlike(experiment):
    """--use_clf adversarial branch and the ganlike joint-training variant."""
    tmp, cfg_dir, pre = experiment
    from masg_tpu.cli.train import main as train_main
    from masg_tpu.cli.train_ganlike import main as gan_main

    train_main(["-c", cfg_dir, "--max_steps", "2", "--use_clf"])
    gan_main(["-c", cfg_dir, "--max_steps", "2"])
    # opt-in GE2E-domain discriminator featurization (train/step.py
    # clf_featurization="ge2e"): same step, different disc input basis
    train_main(["-c", cfg_dir, "--max_steps", "1", "--use_clf",
                "--clf_featurization", "ge2e"])


def test_multicorpus_gather_and_concat_training(tmp_path):
    """Two synthetic corpora (ja + en) -> per-corpus preprocess (norm off) ->
    gather global stats/speakers -> ConcatDataset bilingual training
    (the JVS-VCTK path, reference preprocess.py:15-16 + gather.py)."""
    import numpy as np
    import yaml as _yaml

    from fixtures import make_synthetic_corpus
    from masg_tpu.cli.gather import main as gather_main
    from masg_tpu.cli.preprocess import main as preprocess_main
    from masg_tpu.cli.train import main as train_main

    tmp = str(tmp_path)
    # two corpora with disjoint speakers/languages
    _, pre_a, _ = make_synthetic_corpus(tmp, n_speakers=2, utts_per_speaker=5,
                                        dataset="CORPA", languages=("ja",),
                                        speaker_prefix="aspk")
    _, pre_b, _ = make_synthetic_corpus(tmp, n_speakers=2, utts_per_speaker=5,
                                        dataset="CORPB", seed=9, languages=("en",),
                                        speaker_prefix="bspk")
    cfg_dir = make_config_dir(tmp, pre_a, tmp)
    # replace the SYNTH corpus yaml with the two real ones
    os.remove(os.path.join(cfg_dir, "preprocess_SYNTH.yaml"))
    for name, pre in (("CORPA", pre_a), ("CORPB", pre_b)):
        with open(os.path.join(cfg_dir, f"preprocess_{name}.yaml"), "w") as f:
            _yaml.dump({
                "dataset": name,
                "path": {"raw_path": os.path.join(tmp, "raw_data", name),
                         "preprocessed_path": pre},
                "text": {"text_cleaners": [], "language": "ja" if name == "CORPA" else "en"},
                "accent": {"use_accent": True},
            }, f)

    preprocess_main(["--config", cfg_dir])  # multi-corpus: per-corpus norm off
    gather_main(["--config", cfg_dir])

    stats = json.load(open(os.path.join(cfg_dir, "stats.json")))
    speakers = json.load(open(os.path.join(cfg_dir, "speakers.json")))
    assert len(speakers) == 4  # 2 + 2 remapped to global ids
    assert sorted(v[0] for v in speakers.values()) == [0, 1, 2, 3]
    # unnormalized per-corpus pitches -> global stats have real Hz mean
    assert stats["pitch"][2] > 50

    train_main(["-c", cfg_dir, "--max_steps", "5", "--corpus", "CORPA", "CORPB"])
    log = open(os.path.join(tmp, "out/log/train/log.txt")).read()
    assert "Step 5" in log


def test_evaluate_cli_val_and_test_split(experiment, capsys):
    """Standalone evaluate CLI (reference evaluate.py: val.txt,
    size-weighted means); --split test.txt evaluates the held-out split."""
    import re

    tmp, cfg_dir, pre = experiment
    from masg_tpu.cli.evaluate import main as eval_main

    eval_main(["-c", cfg_dir, "--restore_step", "20"])
    out_val = capsys.readouterr().out
    assert "Validation Step 20" in out_val

    eval_main(["-c", cfg_dir, "--restore_step", "20", "--split", "test.txt"])
    out_test = capsys.readouterr().out
    assert "Validation Step 20" in out_test

    def losses(s):
        return [float(x) for x in re.findall(r"Loss: ([\d.]+)", s)]

    lv, lt = losses(out_val), losses(out_test)
    assert len(lv) == 6 and len(lt) == 6
    assert all(np.isfinite(lv)) and all(np.isfinite(lt))
    # different splits -> different numbers (guards against split mixups)
    assert lv != lt


def test_train_jdit_e2e(experiment):
    """JDIT (joint-duration Tacotron2 attention teacher) trains through the
    production Trainer: the jdit MSE joins the loss (reference
    train.py:150-154, config/JSUT/model-jdit.yaml:24), losses stay finite,
    and synth_sample writes the alignment heatmap figure."""
    import jax

    from masg_tpu.core.config import load_config_dir
    from masg_tpu.train.loop import build_experiment

    tmp, cfg_dir, pre = experiment
    cfg = load_config_dir(cfg_dir)
    cfg.model.jdit.use_jdit = True
    cfg.train.path.ckpt_path = os.path.join(tmp, "jdit_out", "ckpt")
    cfg.train.path.log_path = os.path.join(tmp, "jdit_out", "log")

    trainer = build_experiment(cfg, n_devices=1)
    group = next(iter(trainer.train_loader))
    batch = group[0]

    # the jdit branch is LIVE: eval forward returns teacher mel + alignments
    _, _, out = trainer.eval_step_fn(trainer.state, trainer._place_batch(batch))
    assert out.mel_jdit is not None and out.alignments is not None
    assert np.isfinite(np.asarray(out.mel_jdit)).all()
    a = np.asarray(out.alignments)
    # soft attention rows are a distribution over phones
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-4)

    trainer.fit(max_steps=5, verbose=False)  # log_step=5 -> one logged line
    log = open(os.path.join(tmp, "jdit_out/log/train/log.txt")).read()
    import re

    totals = [float(x) for x in re.findall(r"Total Loss: ([\d.eE+-]+)", log)]
    assert totals and np.all(np.isfinite(totals))

    # alignment figure written by the synth hook
    tags = []
    trainer.train_logger.add_figure = lambda tag, fig, step: tags.append(tag)
    trainer.synth_sample(batch, step=2)
    assert any("alignment" in t for t in tags), tags
