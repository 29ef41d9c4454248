"""Does lambda do something SEMANTIC? (VERDICT r5 item 5)

From one warm start (the reference-scale 30k pretrain), run --use_clf
fine-tunes at lambda in {0, 1, 10} under the reference-faithful
featurization, plus lambda=10 under the opt-in `--clf_featurization ge2e`
(in-graph mel-basis change that closes the reference's featurization gap,
train/step.py). After each, measure:

  cross-lingual speaker consistency: sample K speakers from the ja-corner
  priors, synthesize language-typical ja and en phone strings with the SAME
  speaker embedding, GE2E-embed both wavs, report mean cos(e_ja, e_en) —
  the langemb recipe's goal is a speaker identity stable across languages.

Also records the discriminator BCE trajectory per run (ln2-pinned = the
featurization gap; moving = a live language signal).

Reference anchor: /root/reference/train.py:169-197 (the lambda schedule) +
config/JVS-VCTK_langemb_configs/* (the lambda sweep this reproduces).

    python scripts/lambda_sweep.py --refscale /tmp/refscale --out /tmp/lsweep
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JA_PHONES = "{a o u m a n o o k a m o a u n a m e o a}"
EN_PHONES = "{i e s t k e i t e s i k e t e i s e k i}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refscale", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--pretrain_step", type=int, default=30000)
    ap.add_argument("--vocoder_ckpt",
                    default="/tmp/full_pipe/vocoder/generator_4000.msgpack")
    ap.add_argument("--hifigan_config",
                    default="/tmp/full_pipe/config/hifigan_config.json")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np
    import yaml

    import jax
    import jax.numpy as jnp

    from masg_tpu.cli.train import main as train_main
    from masg_tpu.core.config import load_config_dir
    from masg_tpu.eval.attribute_probe import embed_wavs
    from masg_tpu.infer.synthesis import load_model, round_up, synthesize_batch
    from masg_tpu.infer.vocoder import get_vocoder
    from masg_tpu.models import FastSpeech2
    from masg_tpu.models.speaker_encoder import SpeechEmbedder
    from masg_tpu.ops.gmm import sample as gmm_sample
    from masg_tpu.text import NO_ACCENT_ID, phone_string_to_sequence
    from masg_tpu.train.loop import load_ge2e_checkpoint

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()

    def mark(msg):
        print(f"[lsweep +{time.time()-t0:7.1f}s] {msg}", flush=True)

    cfg_dir = os.path.join(args.refscale, "config")
    enc_dir = os.path.join(args.refscale, "spk_enc")
    warm = os.path.join(args.refscale, "out", "ckpt",
                        str(args.pretrain_step))

    embedder0 = SpeechEmbedder(n_mels=80)
    ge2e_params = load_ge2e_checkpoint(enc_dir, embedder0)
    hidden = int(np.shape(ge2e_params["OptimizedLSTMCell_0"]["hf"]["bias"])[0])
    proj = int(np.shape(ge2e_params["projection"]["kernel"])[1])
    embedder = SpeechEmbedder(n_mels=80, hidden=hidden, proj=proj)

    cells = [("lam0", 0.0, "model"), ("lam1", 1.0, "model"),
             ("lam10", 10.0, "model"), ("lam10_ge2e", 10.0, "ge2e")]

    def run_cell(name, lam, feat):
        cell_cfg = os.path.join(args.out, f"config_{name}")
        os.makedirs(cell_cfg, exist_ok=True)
        for f in os.listdir(cfg_dir):
            shutil.copy(os.path.join(cfg_dir, f), os.path.join(cell_cfg, f))
        with open(os.path.join(cell_cfg, "train.yaml")) as f:
            ty = yaml.safe_load(f)
        ty["discriminator_path"] = enc_dir
        ty["lambda"] = lam
        ty["path"] = {"ckpt_path": os.path.join(args.out, name, "ckpt"),
                      "log_path": os.path.join(args.out, name, "log"),
                      "result_path": os.path.join(args.out, name, "result")}
        ty["step"] = dict(ty["step"], total_step=args.steps,
                          save_step=args.steps, val_step=10**9, log_step=100,
                          keep_last=1)
        with open(os.path.join(cell_cfg, "train.yaml"), "w") as f:
            yaml.dump(ty, f)
        train_main(["-c", cell_cfg, "--use_clf", "--bf16", "--seed", "0",
                    "--checkpoint", warm,
                    "--clf_featurization", feat])
        dl = []
        scalars = os.path.join(args.out, name, "log", "train",
                               "scalars.jsonl")
        for line in open(scalars):
            rec = json.loads(line)
            if rec["tag"] == "Loss/language_classification_loss":
                dl.append((rec["step"], rec["value"]))
        return cell_cfg, dl

    def cross_lingual_consistency(cell_cfg):
        cfg = load_config_dir(cell_cfg)
        model, variables = load_model(cfg, args.steps)
        vocoder = get_vocoder(cfg.model, os.path.dirname(args.hifigan_config),
                              checkpoint=args.vocoder_ckpt)
        hop = vocoder.hop_length
        schema = cfg.preprocess.speaker_generation

        def prior(meta):
            return model.apply(
                variables, np.asarray(schema.one_hot(meta), np.float32)[None],
                method=FastSpeech2.speaker_distribution)

        key = jax.random.PRNGKey(args.seed)
        k1, k2 = jax.random.split(key)
        half = args.k // 2
        embs = np.concatenate([
            np.asarray(gmm_sample(prior({"gender": "M", "language": "ja"}),
                                  k1, sample_shape=(half,))).reshape(half, -1),
            np.asarray(gmm_sample(prior({"gender": "F", "language": "ja"}),
                                  k2, sample_shape=(args.k - half,)
                                  )).reshape(args.k - half, -1),
        ]).astype(np.float32)

        def synth(phones):
            ids = phone_string_to_sequence(phones)
            L = round_up(len(ids), 16)
            texts = np.zeros((args.k, L), np.int32)
            texts[:, : len(ids)] = ids
            acc = np.zeros((args.k, L), np.int32)
            acc[:, : len(ids)] = NO_ACCENT_ID
            batch = {"texts": texts,
                     "src_lens": np.full((args.k,), len(ids), np.int32),
                     "accents": acc}
            out = synthesize_batch(model, variables, batch, max_mel_len=512,
                                   speaker_emb=embs)
            mels = np.asarray(out.postnet_mel, np.float32)
            mel_lens = np.asarray(out.mel_len, np.int64).reshape(-1)
            wavs = np.asarray(vocoder(jnp.asarray(mels)), np.float32)
            return [wavs[i, : int(mel_lens[i]) * hop] for i in range(args.k)]

        e_ja = embed_wavs(embedder, ge2e_params, synth(JA_PHONES))
        e_en = embed_wavs(embedder, ge2e_params, synth(EN_PHONES))
        cos = np.sum(e_ja * e_en, axis=-1)
        return float(cos.mean()), float(cos.std())

    report = {"steps": args.steps, "cells": {}}
    for name, lam, feat in cells:
        mark(f"cell {name}: lambda={lam} featurization={feat}")
        cell_cfg, dl = run_cell(name, lam, feat)
        mean, std = cross_lingual_consistency(cell_cfg)
        report["cells"][name] = {
            "lambda": lam, "featurization": feat,
            "dloss_first": dl[0] if dl else None,
            "dloss_last": dl[-1] if dl else None,
            "cross_lingual_cos_mean": mean,
            "cross_lingual_cos_std": std,
        }
        mark(f"cell {name}: cross-lingual cos {mean:.4f} +- {std:.4f}, "
             f"dloss {dl[0][1] if dl else None} -> {dl[-1][1] if dl else None}")
        with open(os.path.join(args.out, "lambda_sweep.json"), "w") as f:
            json.dump(report, f, indent=1)
    report["wall_s"] = round(time.time() - t0, 1)
    with open(os.path.join(args.out, "lambda_sweep.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1), flush=True)


if __name__ == "__main__":
    main()
