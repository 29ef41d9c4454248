"""Synthetic corpus fixture: a few seconds of generated audio + TextGrids,
enough to drive preprocess -> dataset -> train -> synthesize end-to-end."""

import os

import numpy as np

from masg_tpu.audio.wavio import write_wav
from masg_tpu.preprocessor.textgrid import Interval, TextGrid, Tier, write_textgrid

SR = 22050

# tiny phone inventory drawn from the real symbol table
PHONES = ["a", "i", "u", "e", "o", "k", "s", "t", "n", "m"]


def synth_utterance(rng, f0_base, n_phones=8):
    """Voiced tone with per-phone F0/amplitude steps + silence padding."""
    phones, intervals = [], []
    t = 0.15  # leading silence
    segs = [np.zeros(int(t * SR))]
    intervals.append(Interval(0.0, t, "sil"))
    for i in range(n_phones):
        p = PHONES[rng.integers(0, len(PHONES))]
        dur = float(rng.uniform(0.06, 0.18))
        f0 = f0_base * float(rng.uniform(0.9, 1.15))
        n = int(dur * SR)
        tt = np.arange(n) / SR
        amp = 0.4 * float(rng.uniform(0.6, 1.0))
        seg = amp * (
            np.sin(2 * np.pi * f0 * tt)
            + 0.4 * np.sin(4 * np.pi * f0 * tt)
            + 0.15 * np.sin(6 * np.pi * f0 * tt)
        )
        # fade edges to avoid clicks
        fade = min(128, n // 4)
        seg[:fade] *= np.linspace(0, 1, fade)
        seg[-fade:] *= np.linspace(1, 0, fade)
        segs.append(seg)
        phones.append(p)
        intervals.append(Interval(t, t + dur, p))
        t += dur
    tail = 0.12
    segs.append(np.zeros(int(tail * SR)))
    intervals.append(Interval(t, t + tail, "sil"))
    wav = np.concatenate(segs).astype(np.float32)
    return wav, phones, intervals, t + tail


def make_synthetic_corpus(root, n_speakers=2, utts_per_speaker=3, seed=0,
                          dataset="SYNTH", languages=("ja",), speaker_prefix="spk"):
    """Create raw_data/<spk>/*.{wav,lab} + preprocessed_data TextGrids +
    accent files + speakers.json. Returns (raw_dir, preprocessed_dir, config)."""
    rng = np.random.default_rng(seed)
    raw = os.path.join(root, "raw_data", dataset)
    pre = os.path.join(root, "preprocessed_data", dataset)
    os.makedirs(os.path.join(pre, "accent"), exist_ok=True)

    speakers = {}
    for s in range(n_speakers):
        spk = f"{speaker_prefix}{s:02d}"
        gender = "M" if s % 2 == 0 else "F"
        lang = languages[s % len(languages)]
        speakers[spk] = [s, gender, lang]
        spk_raw = os.path.join(raw, spk)
        tg_dir = os.path.join(pre, "TextGrid", spk)
        os.makedirs(spk_raw, exist_ok=True)
        os.makedirs(tg_dir, exist_ok=True)
        f0_base = 120.0 if gender == "M" else 210.0
        for u in range(utts_per_speaker):
            base = f"{spk}_utt{u:02d}"
            wav, phones, intervals, total = synth_utterance(rng, f0_base)
            write_wav(os.path.join(spk_raw, base + ".wav"), wav, SR)
            with open(os.path.join(spk_raw, base + ".lab"), "w") as f:
                f.write(" ".join(phones) + "\n")
            tg = TextGrid(tiers=[Tier(name="phones", intervals=intervals)])
            write_textgrid(os.path.join(tg_dir, base + ".TextGrid"), tg, 0.0, total)
            with open(os.path.join(pre, "accent", base + ".accent"), "w") as f:
                f.write("0" * len(phones))

    import json

    with open(os.path.join(pre, "speakers.json"), "w") as f:
        json.dump(speakers, f)

    config = {
        "dataset": dataset,
        "path": {"raw_path": raw, "preprocessed_path": pre},
        "preprocessing": {
            "val_size": 0.2,
            "test_size": 0.2,
            "audio": {"sampling_rate": SR, "max_wav_value": 32768.0},
            "stft": {"filter_length": 1024, "hop_length": 256, "win_length": 1024},
            "mel": {"n_mel_channels": 80, "mel_fmin": 0, "mel_fmax": 8000},
            "pitch": {"feature": "phoneme_level", "normalization": True},
            "energy": {"feature": "phoneme_level", "normalization": True},
            "speaker_generation": {
                "metadata": {"gender": {"M": 0, "F": 1}, "language": {"ja": 0, "en": 1}}
            },
        },
        "text": {"text_cleaners": [], "language": "ja"},
        "accent": {"use_accent": True},
    }
    return raw, pre, config
