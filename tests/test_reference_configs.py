"""Every config family shipped with the reference loads unchanged and builds
a model (SURVEY §2.10: 14 families under /root/reference/config)."""

import glob
import os

import pytest

REF_CONFIG = "/root/reference/config"

pytestmark = [pytest.mark.smoke, pytest.mark.skipif(
    not os.path.isdir(REF_CONFIG), reason="reference configs not mounted"
)]


def config_dirs():
    out = []
    for root, dirs, files in os.walk(REF_CONFIG):
        if "model.yaml" in files and "train.yaml" in files:
            out.append(root)
    return sorted(out)


def test_finds_all_families():
    dirs = config_dirs()
    assert len(dirs) >= 14, dirs  # JSUT, JVS, JVS-VCTK + langemb/ganlike sweeps


@pytest.mark.parametrize("cfg_dir", config_dirs())
def test_loads_and_builds(cfg_dir):
    from masg_tpu.core.config import load_config_dir
    from masg_tpu.models import FastSpeech2

    cfg = load_config_dir(cfg_dir)
    assert cfg.model.transformer.encoder_hidden == 256
    assert cfg.model.max_seq_len == 1000
    if cfg.speakers is None:
        # base dirs (JSUT/JVS/JVS-VCTK) ship no speakers.json — the user must
        # run gather/preprocess first; both the reference (fastspeech2.py:39-45
        # open()) and we fail loudly here
        with pytest.raises(FileNotFoundError):
            FastSpeech2.from_config(cfg)
        return
    model = FastSpeech2.from_config(cfg)  # bins derive from stats (or defaults)
    assert model.n_bins == 256
    assert model.n_speakers == len(cfg.speakers)
    # langemb (non-ganlike, non-woge2e) dirs carry the pretrained GE2E ckpt;
    # ganlike trains the discriminator jointly and ships no path
    if "langemb_configs" in cfg_dir and "_woge2e" not in cfg_dir:
        assert cfg.train.discriminator_path
