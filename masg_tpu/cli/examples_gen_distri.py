"""Sample speakers from a saved mid-attribute distribution and synthesize.

Equivalent of the reference's `python examples_gen_distri.py`
(examples_gen_distri.py:128-231): load a saved distribution (an
InterpolateGMM/BarycenterGMM product built offline), sample N speakers,
synthesize a Japanese sample per speaker, save embeddings + wavs.

Distribution files are .npz archives of (pi, mu, sigma) written by
`masg_tpu.cli.build_distribution` (the torch-free replacement for
`torch.save(distri)`); torch .pth distributions from the reference are also
loadable when torch is present.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_distribution(path: str):
    """Load a speaker distribution: our .npz (pi/mu/sigma) or the reference's
    torch-pickled InterpolateGMM/BarycenterGMM .pth
    (examples_gen_distri.py:207-215: `torch.load("distributions/*.pth")`).

    The reference pickles instances of its own `model.distributions.*`
    classes, which don't exist here — a stub unpickler stands in for any
    unimportable class so the inner torch tensors (Categorical probs,
    Independent(Normal) loc/scale) reconstruct normally and convert to
    DiagGMM arrays."""
    from ..ops.gmm import DiagGMM

    if path.endswith(".npz"):
        z = np.load(path)
        return DiagGMM(pi=z["pi"], mu=z["mu"], sigma=z["sigma"])
    import pickle
    import types

    import torch

    class _StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ModuleNotFoundError, AttributeError):
                # reference-repo class (e.g. model.distributions.InterpolateGMM):
                # a bare shell is enough, we only read its __dict__
                return type(name, (), {})

    shim = types.ModuleType("masg_tpu_stub_pickle")  # torch wants a module
    shim.Unpickler = _StubUnpickler
    shim.load = lambda f, **kw: _StubUnpickler(f, **kw).load()
    d = torch.load(path, map_location="cpu", pickle_module=shim,
                   weights_only=False)

    def attr(obj, public, private):
        v = obj.__dict__.get(private) if hasattr(obj, "__dict__") else None
        return v if v is not None else getattr(obj, public)

    mix = attr(d, "mixture_distribution", "_mixture_distribution")
    comp = attr(d, "component_distribution", "_component_distribution")
    base = comp.base_dist if hasattr(comp, "base_dist") else comp
    return DiagGMM(
        pi=mix.probs.detach().numpy(),
        mu=base.loc.detach().numpy(),
        sigma=base.scale.detach().numpy(),
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-r", "--restore_step", type=int, required=True,
                    help="checkpoint step to load (0 = random init, for smoke tests only; the reference requires a checkpoint)")
    parser.add_argument("-d", "--distribution", type=str, required=True,
                        help=".npz (pi/mu/sigma) or reference .pth distribution")
    parser.add_argument("--n_speakers", type=int, default=99)
    parser.add_argument("--output_path", type=str, required=True)
    parser.add_argument("--text_ja", type=str, default=None)
    parser.add_argument("--phones_ja", type=str,
                        default="{k o N n i ch i w a sp m i n a s a N}")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no_vocoder", action="store_true")
    parser.add_argument("--vocoder_checkpoint", type=str, default=None,
                        help="HiFi-GAN generator ckpt (torch 'generator' "
                             "state_dict or our flax .msgpack export)")
    parser.add_argument("--duration_control", type=float, default=1.0)
    args = parser.parse_args(argv)

    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from ..core.config import load_config_dir
    from ..infer.synthesis import load_model, round_up, save_synth_results, synthesize_batch
    from ..infer.vocoder import get_vocoder
    from ..ops.gmm import sample as gmm_sample
    from ..text import NO_ACCENT_ID, phone_string_to_sequence, text_to_sequence

    cfg = load_config_dir(args.config)
    if args.restore_step == 0:
        print("WARNING: --restore_step 0 synthesizes with RANDOM weights")
    model, variables = load_model(cfg, args.restore_step)
    vocoder = None if args.no_vocoder else get_vocoder(
        cfg.model, cfg.config_dir, checkpoint=args.vocoder_checkpoint)
    gmm = load_distribution(args.distribution)
    os.makedirs(args.output_path, exist_ok=True)

    if args.text_ja is not None:
        from ..text.g2p import preprocess_japanese

        phones, _ = preprocess_japanese(args.text_ja)
        ids = text_to_sequence(phones)
    else:
        ids = phone_string_to_sequence(args.phones_ja)
    L = round_up(len(ids), 16)
    texts = np.zeros((1, L), np.int32)
    texts[0, : len(ids)] = ids
    acc = np.zeros((1, L), np.int32)
    acc[0, : len(ids)] = NO_ACCENT_ID

    key = jax.random.PRNGKey(args.seed)
    for i in range(1, args.n_speakers + 1):
        key, sub = jax.random.split(key)
        emb = np.asarray(gmm_sample(gmm, sub)).reshape(1, -1).astype(np.float32)
        name = f"gen{i:0>3d}"
        batch = {"ids": [name + "_ja"], "raw_texts": [name],
                 "texts": texts, "src_lens": np.array([len(ids)], np.int32),
                 "accents": acc}
        out = synthesize_batch(
            model, variables, batch, max_mel_len=cfg.model.max_seq_len,
            d_control=args.duration_control, speaker_emb=emb,
        )
        save_synth_results(cfg, batch, out, vocoder, args.output_path,
                           write_figures=False)
        np.save(os.path.join(args.output_path, name + ".npy"), emb)
    print(f"{args.n_speakers} sampled speakers written to {args.output_path}")


if __name__ == "__main__":
    main()
