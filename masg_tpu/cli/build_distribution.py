"""Build a mid-attribute speaker distribution offline.

Replacement for the reference's offline distribution construction
(distributions.py used interactively + torch.save of the result,
examples_gen_distri.py:207-215): compute InterpolateGMM between two metadata
corners or the BarycenterGMM over all corners, and save (pi, mu, sigma) as a
portable .npz.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-r", "--restore_step", type=int, default=0,
                        help="checkpoint step (0 = random prior, smoke tests only)")
    parser.add_argument("--mode", choices=["interpolate", "barycenter"],
                        default="barycenter")
    parser.add_argument("--corner_a", type=str, nargs="*", default=["gender=M", "language=ja"],
                        help="metadata values for endpoint A (interpolate mode)")
    parser.add_argument("--corner_b", type=str, nargs="*", default=["gender=F", "language=ja"])
    parser.add_argument("--t", type=float, default=0.5, help="interpolation rate")
    parser.add_argument("--rates", type=float, nargs="*", default=None,
                        help="barycenter rates (default uniform over corners)")
    parser.add_argument("-o", "--output", type=str, required=True, help=".npz path")
    args = parser.parse_args(argv)

    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..core.config import load_config_dir
    from ..distributions.wasserstein import BarycenterGMM, InterpolateGMM, metadata_corners
    from ..infer.synthesis import load_model
    from ..models import FastSpeech2

    cfg = load_config_dir(args.config)
    model, variables = load_model(cfg, args.restore_step)
    schema = cfg.preprocess.speaker_generation

    def prior(meta_vec):
        return model.apply(
            variables, np.asarray(meta_vec, np.float32)[None, :],
            method=FastSpeech2.speaker_distribution,
        )

    if args.mode == "interpolate":
        def parse_corner(kvs):
            return schema.one_hot(dict(kv.split("=") for kv in kvs))

        ga = prior(parse_corner(args.corner_a))
        gb = prior(parse_corner(args.corner_b))
        interp = InterpolateGMM(ga, gb)
        gmm = interp.interpolate_rate(args.t)
    else:
        corners = metadata_corners(schema.metadata)
        gmms = [prior(c) for c in corners]
        bc = BarycenterGMM(gmms, rates=args.rates)
        gmm = bc.gmm

    np.savez(args.output, pi=np.asarray(gmm.pi), mu=np.asarray(gmm.mu),
             sigma=np.asarray(gmm.sigma))
    print(f"{args.mode} distribution ({np.asarray(gmm.pi).shape[-1]} components) -> {args.output}")


if __name__ == "__main__":
    main()
