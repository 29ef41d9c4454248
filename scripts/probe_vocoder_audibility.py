"""Vocoder audibility probe on the real chip (VERDICT r4 item 2).

Question: how many from-scratch HiFi-GAN steps until the demo vocoder's
output is AUDIBLE (peak >= 0.1 FS) and spectrally sane on the vocal-style
synthetic corpus? The round-3 demo stopped at 300 steps (peak ~5e-4 FS);
this probe trains --steps with checkpoints every --save_step, then vocodes
ground-truth mels through every checkpoint and prints peak amplitude +
vocoded-vs-GT mel MCD per checkpoint, so the demo can budget the honest
minimum (reference anchor: the upstream jik876 HiFi-GAN trains 400k+ steps;
the reference repo itself only loads pretrained blobs, utils/model.py:42-71).

    python scripts/probe_vocoder_audibility.py --out /tmp/voc_probe \
        [--steps 4000] [--save_step 500]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo_mid_attribute import DEMO_HIFIGAN  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--save_step", type=int, default=500)
    ap.add_argument("--wav_dir", default=None,
                    help="existing wav corpus (default: build the demo's "
                         "4-speaker bilingual vocal corpus)")
    args = ap.parse_args()

    import numpy as np

    from masg_tpu.cli.train_vocoder import main as train_vocoder
    from masg_tpu.data.synthetic import make_synthetic_corpus

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()

    wav_dir = args.wav_dir
    if wav_dir is None:
        make_synthetic_corpus(
            args.out, n_speakers=4, utts_per_speaker=20, style="vocal",
            languages=("ja", "ja", "en", "en"))
        wav_dir = os.path.join(args.out, "raw_data", "SYNTH")
    print(f"[+{time.time()-t0:6.1f}s] corpus at {wav_dir}", flush=True)

    cfg_path = os.path.join(args.out, "hifigan_config.json")
    with open(cfg_path, "w") as f:
        json.dump(DEMO_HIFIGAN, f)

    voc_out = os.path.join(args.out, "vocoder")
    train_vocoder(["--wav_dir", wav_dir, "--out", voc_out,
                   "--config", cfg_path, "--steps", str(args.steps),
                   "--save_step", str(args.save_step),
                   "--log_step", "100", "--seed", "0"])
    print(f"[+{time.time()-t0:6.1f}s] training done", flush=True)

    # --- evaluate every generator checkpoint on one GT wav per speaker ---
    import jax.numpy as jnp

    from masg_tpu.audio.wavio import read_wav
    from masg_tpu.infer.vocoder import Vocoder, load_generator_checkpoint
    from masg_tpu.models.hifigan import HiFiGANGenerator
    from masg_tpu.train.vocoder import mel_spectrogram_hifigan
    from masg_tpu.utils.mcd import mcd

    cfg = DEMO_HIFIGAN
    gen = HiFiGANGenerator(
        n_mels=cfg["num_mels"],
        upsample_rates=tuple(cfg["upsample_rates"]),
        upsample_kernel_sizes=tuple(cfg["upsample_kernel_sizes"]),
        upsample_initial_channel=cfg["upsample_initial_channel"],
        resblock_kernel_sizes=tuple(cfg["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in cfg["resblock_dilation_sizes"]),
    )
    hop = int(cfg["hop_size"])

    eval_wavs = []
    for spk in sorted(os.listdir(wav_dir)):
        spk_dir = os.path.join(wav_dir, spk)
        if not os.path.isdir(spk_dir):
            continue
        ws = sorted(p for p in os.listdir(spk_dir) if p.endswith(".wav"))
        if ws:
            eval_wavs.append(os.path.join(spk_dir, ws[0]))
    print(f"eval wavs: {[os.path.basename(p) for p in eval_wavs]}", flush=True)

    gts = []
    for p in eval_wavs:
        wav, _sr = read_wav(p)
        wav = np.asarray(wav, np.float32)
        # match the training distribution: per-file 0.95-peak normalization
        # (VocoderSegmentDataset default / upstream meldataset)
        wav = wav * (0.95 / max(float(np.abs(wav).max()), 1e-9))
        wav = wav[: (len(wav) // hop) * hop]
        gts.append(wav)

    ckpts = sorted(
        (int(f.split("_")[1].split(".")[0]), os.path.join(voc_out, f))
        for f in os.listdir(voc_out)
        if f.startswith("generator_") and f.endswith(".msgpack"))

    results = []
    for step, path in ckpts:
        params = load_generator_checkpoint(path, gen, cfg)
        voc = Vocoder(gen, params, hop_length=hop)
        peaks, mcds, gt_peaks = [], [], []
        for wav in gts:
            mel = mel_spectrogram_hifigan(
                jnp.asarray(wav)[None], n_fft=cfg["n_fft"], hop_length=hop,
                win_length=cfg["win_size"], n_mels=cfg["num_mels"],
                sample_rate=cfg["sampling_rate"], f_min=cfg["fmin"],
                f_max=cfg["fmax"])
            out = np.asarray(voc(mel)[0], np.float32)
            mel_out = mel_spectrogram_hifigan(
                jnp.asarray(out)[None], n_fft=cfg["n_fft"], hop_length=hop,
                win_length=cfg["win_size"], n_mels=cfg["num_mels"],
                sample_rate=cfg["sampling_rate"], f_min=cfg["fmin"],
                f_max=cfg["fmax"])
            peaks.append(float(np.abs(out).max()))
            gt_peaks.append(float(np.abs(wav).max()))
            mcds.append(mcd(np.asarray(mel[0]), np.asarray(mel_out[0])))
        row = {"step": step, "peak": round(float(np.median(peaks)), 5),
               "peak_min": round(float(np.min(peaks)), 5),
               "gt_peak_median": round(float(np.median(gt_peaks)), 5),
               "mcd_db": round(float(np.mean(mcds)), 3)}
        results.append(row)
        print(json.dumps(row), flush=True)

    with open(os.path.join(args.out, "probe_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    audible = [r for r in results if r["peak"] >= 0.1]
    if audible:
        print(f"AUDIBLE from step {audible[0]['step']}: "
              f"peak {audible[0]['peak']} MCD {audible[0]['mcd_db']} dB "
              f"(wall {time.time()-t0:.0f}s total)", flush=True)
    else:
        print(f"NOT audible by step {args.steps} "
              f"(best peak {max((r['peak'] for r in results), default=0)})",
              flush=True)


if __name__ == "__main__":
    main()
