"""Input-pipeline throughput proof (VERDICT r1 item 5).

The reference feeds its trainer with a 20-worker torch DataLoader
(train.py:56-63). masg_tpu's GroupedLoader must deliver utterances at least
2x faster than the measured train consumption rate (32 steps/s x bs 16 =
512 utt/s, BASELINE.md) or the step rate is loader-bound on a real corpus.

Generates a 1000-utterance fake preprocessed corpus (realistic array sizes:
mel ~500x80 f32, phoneme-level pitch/energy/duration ~64) and measures
GroupedLoader epochs end-to-end (np.load + collate + bucketing included).

Usage: python scripts/bench_loader.py [n_utts] [workers]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from masg_tpu.data.dataset import Dataset
from masg_tpu.data.loader import GroupedLoader

CONSUMPTION_UTT_PER_S = 32.0 * 16  # train steps/s x batch size (BASELINE.md)


def make_fake_corpus(root, n_utts=1000, n_speakers=20, seed=0):
    rng = np.random.default_rng(seed)
    pre = os.path.join(root, "preprocessed_data", "FAKE")
    for kind in ("mel", "pitch", "energy", "duration", "accent"):
        os.makedirs(os.path.join(pre, kind), exist_ok=True)
    speakers = {f"spk{s:03d}": [s, "M" if s % 2 == 0 else "F", "ja"]
                for s in range(n_speakers)}
    with open(os.path.join(pre, "speakers.json"), "w") as f:
        json.dump(speakers, f)
    phones = list("aiueoksmnt")
    lines = []
    for i in range(n_utts):
        spk = f"spk{i % n_speakers:03d}"
        base = f"{spk}_utt{i:05d}"
        L = int(rng.integers(32, 96))
        T = int(rng.integers(300, 800))
        dur = rng.multinomial(T, np.ones(L) / L).astype(np.int64)
        np.save(os.path.join(pre, "mel", f"{spk}-mel-{base}.npy"),
                rng.normal(size=(T, 80)).astype(np.float32))
        np.save(os.path.join(pre, "pitch", f"{spk}-pitch-{base}.npy"),
                rng.normal(size=L).astype(np.float64))
        np.save(os.path.join(pre, "energy", f"{spk}-energy-{base}.npy"),
                rng.normal(size=L).astype(np.float32))
        np.save(os.path.join(pre, "duration", f"{spk}-duration-{base}.npy"), dur)
        with open(os.path.join(pre, "accent", base + ".accent"), "w") as f:
            f.write("0" * L)
        text = "{" + " ".join(phones[int(j)] for j in rng.integers(0, 10, L)) + "}"
        lines.append(f"{base}|{spk}|{text}|x")
    with open(os.path.join(pre, "train.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return pre


def bench(n_utts=1000, workers=None):
    tmp = tempfile.mkdtemp(prefix="loaderbench_")
    try:
        pre = make_fake_corpus(tmp, n_utts=n_utts)
        cfg = {
            "dataset": "FAKE",
            "path": {"raw_path": tmp, "preprocessed_path": pre},
            "preprocessing": {
                "pitch": {"feature": "phoneme_level"},
                "energy": {"feature": "phoneme_level"},
                "speaker_generation": {"metadata": {
                    "gender": {"M": 0, "F": 1}, "language": {"ja": 0, "en": 1}}},
            },
            "text": {"text_cleaners": [], "language": "ja"},
            "accent": {"use_accent": True},
        }
        ds = Dataset("train.txt", cfg, batch_size=16, sort=True, drop_last=True,
                     text_bucket=16, mel_bucket=64)
        kwargs = {} if workers is None else {"workers": workers}
        loader = GroupedLoader(ds, batch_size=16, group_size=4, seed=0, **kwargs)

        # warm the page cache, then measure two epochs
        n = sum(len(b["ids"]) for g in loader for b in g)
        t0 = time.perf_counter()
        for _ in range(2):
            n = 0
            for group in loader:
                for batch in group:
                    n += len(batch["ids"])
        dt = (time.perf_counter() - t0) / 2
        rate = n / dt
        print(json.dumps({
            "metric": "loader_utterances_per_s",
            "value": round(rate, 1),
            "unit": "utt/s",
            "n_utts": n,
            "workers": workers if workers is not None else "default",
            "vs_train_consumption": round(rate / CONSUMPTION_UTT_PER_S, 2),
        }))
        return rate
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else None
    bench(n, w)
