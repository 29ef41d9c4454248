"""Find the HiFi-GAN quality plateau + drive the dump_mels fine-tune
(VERDICT r5 item 3).

1. Resume vocoder training from the demo pipeline's checkpoint and extend
   in segments, measuring copy-synthesis MCD (GT mel -> wav -> mel vs GT)
   after each segment, until the curve flattens (< knee_db improvement per
   segment, twice in a row) or --max_steps.
2. `cli/dump_mels` teacher-forced predicted mels from the fine-tuned FS2 ->
   `cli/train_vocoder --warm_start_generator` fine-tune on predicted mels.
3. Report the first END-TO-END text->wav MCD vs GT audio: teacher-forced
   model mels vocoded by (a) the GT-mel generator and (b) the fine-tuned
   generator, scored against the ground-truth wavs' mels.

Reference anchor: /root/reference/utils/model.py:42-92 (the pretrained
universal vocoder whose role these checkpoints fill).

    python scripts/vocoder_plateau.py --pipe /tmp/full_pipe --out /tmp/voc_plateau
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipe", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--start_step", type=int, default=4000)
    ap.add_argument("--segment_steps", type=int, default=3000)
    ap.add_argument("--max_steps", type=int, default=25000)
    ap.add_argument("--knee_db", type=float, default=0.5)
    ap.add_argument("--finetune_steps", type=int, default=3000)
    ap.add_argument("--clf_step", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np
    import yaml

    import jax
    import jax.numpy as jnp

    from masg_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()  # repeated eval graphs hit the disk cache

    from masg_tpu.audio.wavio import read_wav
    from masg_tpu.cli.dump_mels import main as dump_mels
    from masg_tpu.cli.train_vocoder import main as train_vocoder
    from masg_tpu.infer.vocoder import Vocoder, load_generator_checkpoint
    from masg_tpu.models.hifigan import HiFiGANGenerator
    from masg_tpu.train.vocoder import mel_spectrogram_hifigan
    from masg_tpu.utils.mcd import mcd

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()

    def mark(msg):
        print(f"[voc +{time.time()-t0:7.1f}s] {msg}", flush=True)

    with open(os.path.join(args.pipe, "config", "hifigan_config.json")) as f:
        hcfg = json.load(f)
    hop = int(hcfg["hop_size"])
    wav_root = os.path.join(args.pipe, "raw_data", "SYNTH")

    def build_gen():
        return HiFiGANGenerator(
            n_mels=hcfg["num_mels"],
            upsample_rates=tuple(hcfg["upsample_rates"]),
            upsample_kernel_sizes=tuple(hcfg["upsample_kernel_sizes"]),
            upsample_initial_channel=hcfg["upsample_initial_channel"],
            resblock_kernel_sizes=tuple(hcfg["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in hcfg["resblock_dilation_sizes"]))

    # GT eval set: one concatenated per-speaker wav each (0.95-peak
    # normalized, the training distribution), truncated to ONE shared
    # length so every MCD measurement reuses a single compiled vocoder
    # graph (distinct lengths = distinct multi-minute compiles through the
    # tunnel)
    gt_wavs = []
    for spk in sorted(os.listdir(wav_root)):
        paths = sorted(os.listdir(os.path.join(wav_root, spk)))
        wavs = [np.asarray(read_wav(os.path.join(wav_root, spk, p))[0],
                           np.float32)
                for p in paths[:4] if p.endswith(".wav")]
        w = np.concatenate(wavs)
        w = w * (0.95 / max(float(np.abs(w).max()), 1e-9))
        gt_wavs.append(w)
    shared = min(min(len(w) for w in gt_wavs), 8 * 22050) // hop * hop
    gt_wavs = [w[:shared] for w in gt_wavs]

    def hifigan_mel(wav):
        return mel_spectrogram_hifigan(
            jnp.asarray(wav)[None], n_fft=hcfg["n_fft"], hop_length=hop,
            win_length=hcfg["win_size"], n_mels=hcfg["num_mels"],
            sample_rate=hcfg["sampling_rate"], f_min=hcfg["fmin"],
            f_max=hcfg["fmax"])

    def copy_synthesis_mcd(gen_ckpt):
        gen = build_gen()
        voc = Vocoder(gen, load_generator_checkpoint(gen_ckpt, gen, hcfg),
                      hop_length=hop)
        scores, peaks = [], []
        for w in gt_wavs:
            gt_mel = hifigan_mel(w)
            out = np.asarray(voc(gt_mel)[0], np.float32)
            out_mel = hifigan_mel(out)
            scores.append(mcd(np.asarray(gt_mel[0]), np.asarray(out_mel[0])))
            peaks.append(float(np.abs(out).max()))
        return float(np.mean(scores)), float(np.median(peaks))

    # --- 1. extend training to the plateau ----------------------------
    voc_dir = os.path.join(args.pipe, "vocoder")
    curve = []
    m0, p0 = copy_synthesis_mcd(
        os.path.join(voc_dir, f"generator_{args.start_step}.msgpack"))
    curve.append({"step": args.start_step, "mcd_db": m0, "peak": p0})
    mark(f"step {args.start_step}: copy-synthesis MCD {m0:.2f} dB")
    step = args.start_step
    flat_segments = 0
    while step < args.max_steps and flat_segments < 2:
        target = step + args.segment_steps
        train_vocoder([
            "--wav_dir", wav_root, "--out", voc_dir,
            "--config", os.path.join(args.pipe, "config",
                                     "hifigan_config.json"),
            "--restore", os.path.join(voc_dir, f"vocoder_{step}.msgpack"),
            "--steps", str(target), "--save_step", str(args.segment_steps),
            "--log_step", "500", "--seed", str(args.seed)])
        step = target
        m, p = copy_synthesis_mcd(
            os.path.join(voc_dir, f"generator_{step}.msgpack"))
        gain = curve[-1]["mcd_db"] - m
        curve.append({"step": step, "mcd_db": m, "peak": p,
                      "gain_db": round(gain, 3)})
        mark(f"step {step}: copy-synthesis MCD {m:.2f} dB "
             f"(gain {gain:+.2f} dB)")
        flat_segments = flat_segments + 1 if gain < args.knee_db else 0
    best = min(curve, key=lambda r: r["mcd_db"])
    mark(f"plateau: best MCD {best['mcd_db']:.2f} dB @ step {best['step']}")

    # --- 2. dump predicted mels + fine-tune ---------------------------
    mel_dir = os.path.join(args.out, "predicted_mel")
    dump_mels(["-c", os.path.join(args.pipe, "config_langemb"),
               "--restore_step", str(args.clf_step), "--out", mel_dir,
               "--split", "train.txt", "val.txt"])
    mark(f"predicted mels dumped to {mel_dir}")

    ft_dir = os.path.join(args.out, "vocoder_ft")
    train_vocoder([
        "--wav_dir", wav_root, "--mel_dir", mel_dir, "--out", ft_dir,
        "--config", os.path.join(args.pipe, "config", "hifigan_config.json"),
        "--warm_start_generator",
        os.path.join(voc_dir, f"generator_{best['step']}.msgpack"),
        "--steps", str(args.finetune_steps),
        "--save_step", str(args.finetune_steps),
        "--log_step", "500", "--seed", str(args.seed)])
    ft_ckpt = os.path.join(ft_dir, f"generator_{args.finetune_steps}.msgpack")
    mark(f"fine-tuned on predicted mels -> {ft_ckpt}")

    # --- 3. end-to-end text->wav MCD vs GT ----------------------------
    # teacher-forced model mels (frame-aligned with GT audio) vocoded by
    # both generators, scored against the GT wavs' own mels
    from masg_tpu.core.config import load_config_dir
    from masg_tpu.data.dataset import Dataset
    from masg_tpu.train.loop import build_corpus_dict

    cfg = load_config_dir(os.path.join(args.pipe, "config_langemb"))
    cdict = build_corpus_dict(cfg, list(cfg.corpora)[0])
    ds = Dataset("val.txt", cdict, batch_size=8, sort=False, drop_last=False)

    # one padded batch -> one vocoder graph per generator (not 8 per-length
    # compiles)
    items = []
    for i in range(min(8, len(ds))):
        d = ds[i]
        name = f"{d['speaker_name']}-mel-{d['id']}.npy"
        pm = np.load(os.path.join(mel_dir, name))  # (T, n_mels) predicted
        gt, _ = read_wav(os.path.join(wav_root, d["speaker_name"],
                                      d["id"] + ".wav"))
        gt = np.asarray(gt, np.float32)
        gt = gt * (0.95 / max(float(np.abs(gt).max()), 1e-9))
        items.append((pm, gt))
    t_max = max(pm.shape[0] for pm, _ in items)
    pm_batch = np.stack([np.pad(pm, ((0, t_max - pm.shape[0]), (0, 0)),
                                constant_values=np.log(1e-5))
                         for pm, _ in items]).astype(np.float32)

    def e2e_mcd(gen_ckpt):
        gen = build_gen()
        voc = Vocoder(gen, load_generator_checkpoint(gen_ckpt, gen, hcfg),
                      hop_length=hop)
        outs = np.asarray(voc(jnp.asarray(pm_batch)), np.float32)
        scores = []
        for (pm, gt), out in zip(items, outs):
            out = out[: pm.shape[0] * hop]
            n = min(len(out), len(gt)) // hop * hop
            if n < hop * 16:
                continue
            gm = np.asarray(hifigan_mel(gt[:n])[0])
            om = np.asarray(hifigan_mel(out[:n])[0])
            scores.append(mcd(gm, om))
        return float(np.mean(scores)), len(scores)

    e2e_gt, n1 = e2e_mcd(
        os.path.join(voc_dir, f"generator_{best['step']}.msgpack"))
    e2e_ft, n2 = e2e_mcd(ft_ckpt)
    mark(f"END-TO-END text->wav MCD vs GT: GT-mel generator {e2e_gt:.2f} dB, "
         f"predicted-mel fine-tuned {e2e_ft:.2f} dB ({n1}/{n2} utts)")

    report = {
        "curve": curve, "best": best,
        "finetune_steps": args.finetune_steps,
        "e2e_text_to_wav_mcd_db": {"gt_mel_generator": e2e_gt,
                                   "finetuned_generator": e2e_ft,
                                   "n_utts": n1},
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(args.out, "vocoder_plateau.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1), flush=True)


if __name__ == "__main__":
    main()
