"""Measure the namesake mid-attribute claim (VERDICT r5 item 1).

Objective version of the paper's subjective test, built from in-repo tools:
a trained pipeline's FS2 model (+GMM speaker prior) + GE2E encoder + trained
vocoder.

Two probe instruments, both anchored on GROUND-TRUTH corpus audio (never on
the samples being scored — a same-sample fit is circular):

  F0 score   mean voiced F0 of the synthesized audio, normalized so the GT
             M-corner mean = 0 and GT F-corner mean = 1. The corpus's
             primary gender cue by construction (f0_base 120 vs 210 Hz,
             data/synthetic.py) and independent of any learned embedder.
  GE2E score scalar projection of the synthesized audio's GE2E embedding
             onto the GT-audio corner axes (masg_tpu.eval.attribute_probe).

Protocol: (a) embed GT corner audio -> axes + F0 anchors; (b) sample K
speakers from each metadata-corner GMM, synthesize, vocode, score
(non-circular separation check); (c) InterpolateGMM(M_ja, F_ja) t-sweep —
scores must move monotonically M -> F; (d) barycenter over ALL corners —
scores near the midpoint.

Reference anchor: /root/reference/examples_gen_distri.py:128-231 +
model/distributions.py:12-192 (the machinery whose purpose this verifies).
Measured context (r5): the W2 interpolation itself is exact in embedding
space (sampled projections = t +- 0.001); what this probe adds is whether
the AUDIO tracks it.

    python scripts/mid_attribute_probe.py --pipe /tmp/full_pipe \
        --out /tmp/mid_probe [--step 400]
"""

import argparse
import glob as globmod
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ~30 phones -> ~300 mel frames at demo speech rate: >= 2 GE2E chunks per wav
PROBE_PHONES = ("{a o i e u m a n o s a t e k a m i n o u e s a k a n a "
                "t o m o e}")
T_GRID = (0.0, 0.25, 0.5, 0.75, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipe", required=True,
                    help="pipeline dir with config_langemb/ + spk_enc/ + "
                         "vocoder/ (demo_full_pipeline layout)")
    ap.add_argument("--corpus_root", default=None,
                    help="dir with raw_data/ + preprocessed_data/ for GT "
                         "anchors (default: --pipe)")
    ap.add_argument("--spk_enc", default=None,
                    help="GE2E checkpoint dir (default: <pipe>/spk_enc)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--step", type=int, default=None,
                    help="fine-tuned ckpt step (default: latest in ckpt dir)")
    ap.add_argument("--config_subdir", default="config_langemb")
    ap.add_argument("--k", type=int, default=8, help="samples per corner/t")
    ap.add_argument("--gt_spk_per_corner", type=int, default=8)
    ap.add_argument("--gt_wavs_per_spk", type=int, default=2)
    ap.add_argument("--vocoder_ckpt", default=None,
                    help="default: <pipe>/vocoder/generator_4000.msgpack")
    ap.add_argument("--max_mel_len", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from masg_tpu.audio.wavio import read_wav
    from masg_tpu.core.config import load_config_dir
    from masg_tpu.distributions.wasserstein import BarycenterGMM, InterpolateGMM
    from masg_tpu.eval.attribute_probe import (AttributeAxes, embed_wavs,
                                               mean_voiced_f0)
    from masg_tpu.infer.synthesis import load_model, round_up, synthesize_batch
    from masg_tpu.infer.vocoder import get_vocoder
    from masg_tpu.models import FastSpeech2
    from masg_tpu.models.speaker_encoder import SpeechEmbedder
    from masg_tpu.ops.gmm import sample as gmm_sample
    from masg_tpu.text import NO_ACCENT_ID, phone_string_to_sequence
    from masg_tpu.train.loop import load_ge2e_checkpoint

    os.makedirs(args.out, exist_ok=True)
    corpus_root = args.corpus_root or args.pipe
    t0 = time.time()

    def mark(msg):
        print(f"[probe +{time.time()-t0:6.1f}s] {msg}", flush=True)

    cfg_dir = os.path.join(args.pipe, args.config_subdir)
    cfg = load_config_dir(cfg_dir)
    step = args.step
    if step is None:
        steps = [int(d) for d in os.listdir(cfg.train.path.ckpt_path)
                 if d.isdigit()]
        step = max(steps)
    model, variables = load_model(cfg, step)
    vocoder = get_vocoder(
        cfg.model, cfg.config_dir,
        checkpoint=args.vocoder_ckpt or os.path.join(
            args.pipe, "vocoder", "generator_4000.msgpack"))
    hop = vocoder.hop_length

    enc_dir = args.spk_enc or os.path.join(args.pipe, "spk_enc")
    embedder = SpeechEmbedder(n_mels=cfg.preprocess.mel.n_mel_channels)
    ge2e_params = load_ge2e_checkpoint(enc_dir, embedder)
    hidden = int(np.shape(ge2e_params["OptimizedLSTMCell_0"]["hf"]["bias"])[0])
    proj = int(np.shape(ge2e_params["projection"]["kernel"])[1])
    embedder = SpeechEmbedder(n_mels=cfg.preprocess.mel.n_mel_channels,
                              hidden=hidden, proj=proj)
    mark(f"model @ step {step}, vocoder, GE2E encoder loaded")

    # --- GT anchors: corner axes + F0 means from real corpus audio -----
    corner_of = {}  # speaker -> corner name
    wavs_of = {}
    for sj in sorted(globmod.glob(os.path.join(
            corpus_root, "preprocessed_data", "*", "speakers.json"))):
        dataset = os.path.basename(os.path.dirname(sj))
        with open(sj) as f:
            speakers = json.load(f)
        for spk, (_sid, gender, lang) in speakers.items():
            corner_of[spk] = f"{gender}_{lang}"
            wavs_of[spk] = sorted(globmod.glob(os.path.join(
                corpus_root, "raw_data", dataset, spk, "*.wav")))
    gt_embs: dict = {}
    gt_f0: dict = {}
    per_corner: dict = {}
    for spk, corner in sorted(corner_of.items()):
        if per_corner.get(corner, 0) >= args.gt_spk_per_corner:
            continue
        per_corner[corner] = per_corner.get(corner, 0) + 1
        wavs = [np.asarray(read_wav(p)[0], np.float32)
                for p in wavs_of[spk][: args.gt_wavs_per_spk]]
        cat = np.concatenate(wavs)
        gt_embs.setdefault(corner, []).append(
            embed_wavs(embedder, ge2e_params, [cat])[0])
        gt_f0.setdefault(corner, []).append(mean_voiced_f0(cat))
    corners_present = sorted(gt_embs)
    gt_embs = {k: np.stack(v) for k, v in gt_embs.items()}
    f0_m = float(np.mean([v for k, vs in gt_f0.items()
                          for v in vs if k.startswith("M_")]))
    f0_f = float(np.mean([v for k, vs in gt_f0.items()
                          for v in vs if k.startswith("F_")]))
    axes = AttributeAxes(gt_embs)
    mark(f"GT anchors: corners {corners_present}, "
         f"F0 M {f0_m:.1f} Hz / F {f0_f:.1f} Hz")
    assert f0_f > f0_m + 20, (f0_m, f0_f)

    def f0_score(wavs):
        return np.array([(mean_voiced_f0(w) - f0_m) / (f0_f - f0_m)
                         for w in wavs])

    schema = cfg.preprocess.speaker_generation

    def prior(meta_dict):
        vec = schema.one_hot(meta_dict)
        return model.apply(
            variables, np.asarray(vec, np.float32)[None, :],
            method=FastSpeech2.speaker_distribution)

    ids = phone_string_to_sequence(PROBE_PHONES)
    L = round_up(len(ids), 16)
    texts = np.zeros((args.k, L), np.int32)
    texts[:, : len(ids)] = ids
    acc = np.zeros((args.k, L), np.int32)
    acc[:, : len(ids)] = NO_ACCENT_ID
    src_lens = np.full((args.k,), len(ids), np.int32)
    batch = {"texts": texts, "src_lens": src_lens, "accents": acc}

    def synth(gmm, key):
        """K speakers from gmm -> synthesized+vocoded wavs + embeddings."""
        embs = np.asarray(
            gmm_sample(gmm, key, sample_shape=(args.k,)), np.float32
        ).reshape(args.k, -1)
        out = synthesize_batch(model, variables, batch,
                               max_mel_len=args.max_mel_len,
                               speaker_emb=embs)
        mels = np.asarray(out.postnet_mel, np.float32)
        mel_lens = np.asarray(out.mel_len, np.int64).reshape(-1)
        wav_batch = np.asarray(vocoder(jnp.asarray(mels)), np.float32)
        wavs = [wav_batch[i, : int(mel_lens[i]) * hop]
                for i in range(args.k)]
        assert min(len(w) for w in wavs) > 0, mel_lens
        return wavs, embed_wavs(embedder, ge2e_params, wavs)

    key = jax.random.PRNGKey(args.seed)
    corners = {"M_ja": {"gender": "M", "language": "ja"},
               "F_ja": {"gender": "F", "language": "ja"},
               "M_en": {"gender": "M", "language": "en"},
               "F_en": {"gender": "F", "language": "en"}}
    corner_gmms, corner_embs, corner_f0 = {}, {}, {}
    for name, meta in corners.items():
        key, sub = jax.random.split(key)
        corner_gmms[name] = prior(meta)
        wavs, emb = synth(corner_gmms[name], sub)
        corner_embs[name] = emb
        corner_f0[name] = f0_score(wavs)
        mark(f"corner {name}: f0 score {corner_f0[name].mean():.3f} "
             f"+- {corner_f0[name].std():.3f}")

    # non-circular: GMM-sampled corner audio scored on GT-fit axes
    sep = axes.separation_of(corner_embs)
    f0_sep = float(np.concatenate(
        [corner_f0[k] for k in ("F_ja", "F_en")]).mean() - np.concatenate(
        [corner_f0[k] for k in ("M_ja", "M_en")]).mean())
    mark(f"separation (GT-anchored): ge2e {json.dumps(sep)}; "
         f"f0 gender margin {f0_sep:.3f}")

    # --- interpolation sweep M_ja <-> F_ja ----------------------------
    interp = InterpolateGMM(corner_gmms["M_ja"], corner_gmms["F_ja"])
    sweep = []
    for t in T_GRID:
        key, sub = jax.random.split(key)
        wavs, emb = synth(interp.interpolate_rate(t), sub)
        g = axes.gender_score(emb)
        f = f0_score(wavs)
        sweep.append({"t": t,
                      "f0_score_mean": float(f.mean()),
                      "f0_score_std": float(f.std()),
                      "ge2e_score_mean": float(g.mean()),
                      "ge2e_score_std": float(g.std())})
        mark(f"interp t={t}: f0 {f.mean():.3f}+-{f.std():.3f} "
             f"ge2e {g.mean():.3f}+-{g.std():.3f}")

    # --- barycenter over all corners ----------------------------------
    bc = BarycenterGMM([corner_gmms[n] for n in corners])
    key, sub = jax.random.split(key)
    wavs_bc, emb_bc = synth(bc.gmm, sub)
    f_bc = f0_score(wavs_bc)
    bary = {"f0_score_mean": float(f_bc.mean()),
            "f0_score_std": float(f_bc.std()),
            "ge2e_gender_mean": float(axes.gender_score(emb_bc).mean()),
            "ge2e_language_mean": float(axes.language_score(emb_bc).mean())}
    mark(f"barycenter: {json.dumps(bary)}")

    f0_means = [row["f0_score_mean"] for row in sweep]
    ge2e_means = [row["ge2e_score_mean"] for row in sweep]
    monotone_f0 = all(f0_means[i + 1] >= f0_means[i] - 0.05
                      for i in range(len(f0_means) - 1))
    report = {
        "step": step, "k_per_cell": args.k,
        "gt_f0_hz": {"M": f0_m, "F": f0_f},
        "separation_ge2e": sep, "f0_gender_margin": f0_sep,
        "corner_f0_scores": {k: float(v.mean())
                             for k, v in corner_f0.items()},
        "interp_sweep": sweep, "barycenter": bary,
        "monotone_f0": bool(monotone_f0),
        "f0_endpoints": [f0_means[0], f0_means[-1]],
        "ge2e_endpoints": [ge2e_means[0], ge2e_means[-1]],
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(args.out, "mid_attribute_probe.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1), flush=True)

    # hard gates ride the embedder-independent F0 instrument; the GE2E
    # scores are reported evidence (their reliability depends on the
    # encoder's training scale)
    assert f0_sep > 0.5, f"corner GMMs do not separate gender in F0: {f0_sep}"
    assert monotone_f0, f"interpolation F0 sweep not monotone: {f0_means}"
    assert f0_means[0] < 0.35 and f0_means[-1] > 0.65, (
        f"interpolation F0 endpoints not near corners: {f0_means}")
    assert 0.15 < bary["f0_score_mean"] < 0.85, bary
    print(f"MID-ATTRIBUTE PROBE PASSED in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
