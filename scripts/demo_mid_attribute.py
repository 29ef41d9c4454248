"""One-command mid-attribute speaker-generation demo on the real chip.

The project's namesake feature, end-to-end (VERDICT r2 item 9; reference
flow: examples_gen_distri.py:128-231):

  1. synthesize a bilingual speech-like corpus (4 speakers covering every
     (gender x language) metadata corner) and preprocess it,
  2. train the multi-speaker FastSpeech2 + TacoSpawn speaker prior,
  3. train a small HiFi-GAN on the corpus wavs (no pretrained vocoder blobs
     exist in this environment) and export the generator,
  4. build the MID-ATTRIBUTE distributions offline: the W2 interpolation
     between the M/ja and F/ja corners at t=0.5, and the W2 barycenter over
     all four corners (gender- AND language-neutral),
  5. sample new speakers from each distribution and synthesize Japanese
     utterances through the trained vocoder.

Artifacts (wavs, embeddings, distribution .npz) land under --out; the
script prints every path and per-stage wall time.

    python scripts/demo_mid_attribute.py --out /tmp/mid_attr_demo \
        [--fs2_steps 1200] [--vocoder_steps 300] [--n_speakers_sampled 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# tiny HiFi-GAN: enough to vocode a 4-speaker synthetic corpus while keeping
# the demo's wall time in minutes. Written into the config dir as
# hifigan_config.json so training and inference agree on dims.
DEMO_HIFIGAN = {
    # segment_size 8192 = 32 mel frames (upstream V1): 4096 was measured
    # worse — 16 frames is under the generator's receptive field, so
    # boundary effects dominate every training example
    "segment_size": 8192, "hop_size": 256, "n_fft": 1024, "win_size": 1024,
    "num_mels": 80, "sampling_rate": 22050, "fmin": 0, "fmax": 8000,
    "fmax_for_loss": None, "learning_rate": 2e-4, "adam_b1": 0.8,
    "adam_b2": 0.99, "lr_decay": 0.999, "batch_size": 8,
    "upsample_rates": [8, 8, 2, 2], "upsample_kernel_sizes": [16, 16, 4, 4],
    "upsample_initial_channel": 128, "resblock_kernel_sizes": [3, 7],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
    "mpd_periods": [2, 3, 5], "mpd_channels": [8, 16, 32, 32],
    "msd_scales": 2,
    "msd_layers": [[16, 15, 1, 1], [32, 41, 4, 4], [32, 5, 1, 1]],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--fs2_steps", type=int, default=1200)
    ap.add_argument("--vocoder_steps", type=int, default=4000,
                    help="probe-budgeted for AUDIBLE output (scripts/"
                         "probe_vocoder_audibility): amplitude tracks GT "
                         "from ~1000 steps, copy-synthesis MCD ~20 dB at "
                         "4000 (~6.5 min on one v5e); the round-3 300-step "
                         "default produced peak ~5e-4 FS wavs")
    ap.add_argument("--n_speakers_sampled", type=int, default=3)
    args = ap.parse_args()

    from masg_tpu.cli.build_distribution import main as build_distribution
    from masg_tpu.cli.examples_gen_distri import main as examples_gen_distri
    from masg_tpu.cli.train import main as train_main
    from masg_tpu.cli.train_vocoder import main as train_vocoder
    from masg_tpu.data.synthetic import build_synthetic_experiment_dir

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    stages = []

    def mark(name):
        stages.append((name, time.time() - t0))
        print(f"[demo +{stages[-1][1]:7.1f}s] {name}", flush=True)

    # 1. bilingual vocal corpus: speakers (M,ja) (F,ja) (M,en) (F,en)
    cfg_dir = build_synthetic_experiment_dir(
        args.out, n_speakers=4, utts_per_speaker=20, style="vocal",
        languages=("ja", "ja", "en", "en"),
        batch_size=8, group_size=1, total_step=max(args.fs2_steps, 1),
        log_step=200, val_step=10**9, synth_step=10**9,
        save_step=max(args.fs2_steps, 1), warm_up_step=100)
    with open(os.path.join(cfg_dir, "hifigan_config.json"), "w") as f:
        json.dump(DEMO_HIFIGAN, f)
    mark(f"corpus + preprocess ({cfg_dir})")

    # 2. train FastSpeech2 + speaker prior
    train_main(["-c", cfg_dir, "--max_steps", str(args.fs2_steps), "--seed", "0"])
    mark(f"FastSpeech2 trained {args.fs2_steps} steps")

    # 3. train the vocoder on the corpus wavs
    wav_dir = os.path.join(args.out, "raw_data", "SYNTH")
    voc_out = os.path.join(args.out, "vocoder")
    train_vocoder(["--wav_dir", wav_dir, "--out", voc_out,
                   "--config", os.path.join(cfg_dir, "hifigan_config.json"),
                   "--steps", str(args.vocoder_steps),
                   "--save_step", str(args.vocoder_steps),
                   "--log_step", "100", "--seed", "0"])
    gen_ckpt = os.path.join(voc_out, f"generator_{args.vocoder_steps}.msgpack")
    mark(f"HiFi-GAN trained {args.vocoder_steps} steps -> {gen_ckpt}")

    # 4. mid-attribute distributions
    interp_npz = os.path.join(args.out, "interp_M_F_ja.npz")
    build_distribution(["-c", cfg_dir, "-r", str(args.fs2_steps),
                        "--mode", "interpolate",
                        "--corner_a", "gender=M", "language=ja",
                        "--corner_b", "gender=F", "language=ja",
                        "--t", "0.5", "-o", interp_npz])
    bary_npz = os.path.join(args.out, "barycenter_all.npz")
    build_distribution(["-c", cfg_dir, "-r", str(args.fs2_steps),
                        "--mode", "barycenter", "-o", bary_npz])
    mark(f"distributions built: {interp_npz}, {bary_npz}")

    # 5. sample + synthesize through the trained vocoder
    for name, npz in (("interp", interp_npz), ("barycenter", bary_npz)):
        out_dir = os.path.join(args.out, f"wavs_{name}")
        examples_gen_distri(["-c", cfg_dir, "-r", str(args.fs2_steps),
                             "-d", npz, "--n_speakers",
                             str(args.n_speakers_sampled),
                             "--output_path", out_dir,
                             "--vocoder_checkpoint", gen_ckpt,
                             "--phones_ja", "{a o i e u m a n o s a t e}",
                             "--seed", "0"])
        wavs = sorted(f for f in os.listdir(out_dir) if f.endswith(".wav"))
        mark(f"{name}: {len(wavs)} wavs in {out_dir}: {wavs}")

    print("\n=== mid-attribute demo complete ===")
    for name, t in stages:
        print(f"  +{t:7.1f}s  {name}")
    print(f"total: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
