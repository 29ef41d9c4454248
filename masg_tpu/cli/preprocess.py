"""Preprocessing CLI.

Equivalent of the reference's `python preprocess.py --config <config_dir>`
(preprocess.py:8-35): for each preprocess_<CORPUS>.yaml in the config dir,
run feature extraction with per-corpus normalization DISABLED when multiple
corpora are present (global stats come from `gather` afterwards, matching
preprocess.py:15-16 + gather.py).
"""

from __future__ import annotations

import argparse


def corpus_to_preproc_dict(cfg, cc):
    return {
        "dataset": cc.dataset,
        "path": {"raw_path": cc.raw_path, "preprocessed_path": cc.preprocessed_path},
        "preprocessing": {
            "val_size": cfg.preprocess.val_size,
            "test_size": cfg.preprocess.test_size,
            "audio": {"sampling_rate": cfg.preprocess.audio.sampling_rate,
                      "max_wav_value": cfg.preprocess.audio.max_wav_value},
            "stft": vars(cfg.preprocess.stft),
            "mel": {"n_mel_channels": cfg.preprocess.mel.n_mel_channels,
                    "mel_fmin": cfg.preprocess.mel.mel_fmin,
                    "mel_fmax": cfg.preprocess.mel.mel_fmax},
            "pitch": vars(cfg.preprocess.pitch),
            "energy": vars(cfg.preprocess.energy),
            "speaker_generation": {"metadata": cfg.preprocess.speaker_generation.metadata},
        },
        "text": {"text_cleaners": cc.text_cleaners, "language": cc.language},
        "accent": {"use_accent": cc.use_accent},
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--corpus", type=str, nargs="*", default=None)
    args = parser.parse_args(argv)

    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..core.config import load_config_dir
    from ..preprocessor.preprocessor import Preprocessor

    cfg = load_config_dir(args.config)
    names = args.corpus or list(cfg.corpora)
    multi = len(names) > 1
    for name in names:
        cc = cfg.corpora[name]
        d = corpus_to_preproc_dict(cfg, cc)
        if multi:
            # normalization off; gather recomputes global stats (preprocess.py:15-16)
            d["preprocessing"]["pitch"] = dict(d["preprocessing"]["pitch"], normalization=False)
            d["preprocessing"]["energy"] = dict(d["preprocessing"]["energy"], normalization=False)
        print(f"=== preprocessing {name} ===")
        Preprocessor(d).build_from_path()


if __name__ == "__main__":
    main()
