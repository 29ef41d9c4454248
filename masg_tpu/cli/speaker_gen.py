"""Sample a new speaker embedding from the metadata-conditioned GMM prior.

Equivalent of the reference's `python speaker_gen.py` (speaker_gen.py:24-73):
one-hot(metadata) -> SpeakerMetaEncoder GMM -> sample -> generated_speaker.npy.
Deterministic under --seed (explicit PRNG key).
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-r", "--restore_step", type=int, required=True,
                    help="checkpoint step to load (0 = random init, for smoke tests only; the reference requires a checkpoint)")
    parser.add_argument("--gender", type=str, default="F")
    parser.add_argument("--language", type=str, default=None,
                        help="optional language one-hot (e.g. ja)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("-o", "--output", type=str, default="generated_speaker.npy")
    args = parser.parse_args(argv)

    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from ..core.config import load_config_dir
    from ..infer.synthesis import load_model
    from ..models import FastSpeech2
    from ..ops.gmm import sample as gmm_sample

    cfg = load_config_dir(args.config)
    if args.restore_step == 0:
        print("WARNING: --restore_step 0 synthesizes with RANDOM weights")
    model, variables = load_model(cfg, args.restore_step)

    values = {}
    if args.gender:
        values["gender"] = args.gender
    if args.language:
        values["language"] = args.language
    meta = cfg.preprocess.speaker_generation.one_hot(values)[None, :]

    gmm = model.apply(variables, np.asarray(meta, np.float32),
                      method=FastSpeech2.speaker_distribution)
    emb = np.asarray(gmm_sample(gmm, jax.random.PRNGKey(args.seed)))
    np.save(args.output, emb[0])
    print(f"sampled speaker embedding {emb.shape[1:]} -> {args.output}")


if __name__ == "__main__":
    main()
