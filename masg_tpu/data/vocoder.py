"""Audio segment sampling for vocoder (GAN) training.

Upstream jik876/hifi-gan's MelDataset loads a wav per item, random-crops
`segment_size` samples, and computes the mel on CPU workers. Here only the
raw audio segments leave the host — the jitted train step featurizes on
device (train/vocoder.py) — so the host side reduces to: cache wavs, crop,
stack. Small corpora are fully cached in RAM.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence

import numpy as np

from ..audio.wavio import read_wav, resample_kaiser


def list_wavs(root: str) -> List[str]:
    out = []
    for dirpath, _, names in os.walk(root):
        for n in sorted(names):
            if n.lower().endswith(".wav"):
                out.append(os.path.join(dirpath, n))
    return sorted(out)


class VocoderSegmentDataset:
    """Random fixed-size segments from a set of wav files.

    Each epoch visits every file once in shuffled order with a fresh random
    crop (upstream MelDataset semantics: split=True random crop, shorter
    files zero-padded to segment_size).
    """

    def __init__(self, wav_paths: Sequence[str], segment_size: int = 8192,
                 sample_rate: int = 22050, seed: int = 1234,
                 max_cache_bytes: int = 2 << 30):
        if not wav_paths:
            raise ValueError("no wav files given")
        self.paths = list(wav_paths)
        self.segment_size = int(segment_size)
        self.sample_rate = int(sample_rate)
        self._rng = np.random.default_rng(seed)
        self._cache = {}
        self._cache_bytes = 0
        self._max_cache_bytes = max_cache_bytes

    def _load(self, path: str) -> np.ndarray:
        audio = self._cache.get(path)
        if audio is None:
            audio, sr = read_wav(path)
            if audio.ndim > 1:
                audio = audio.mean(axis=-1)
            if sr != self.sample_rate:
                audio = resample_kaiser(audio, sr, self.sample_rate)
            audio = np.asarray(audio, np.float32)
            if self._cache_bytes + audio.nbytes <= self._max_cache_bytes:
                self._cache[path] = audio
                self._cache_bytes += audio.nbytes
        return audio

    def _segment(self, audio: np.ndarray) -> np.ndarray:
        n = self.segment_size
        if audio.shape[0] >= n:
            start = int(self._rng.integers(0, audio.shape[0] - n + 1))
            return audio[start:start + n]
        return np.pad(audio, (0, n - audio.shape[0]))

    def batches(self, batch_size: int,
                num_steps: Optional[int] = None) -> Iterator[np.ndarray]:
        """Yield (batch_size, segment_size) float32 batches; files repeat
        across epochs forever (or for num_steps batches)."""
        step = 0
        while True:
            order = self._rng.permutation(len(self.paths))
            for i in range(0, len(order) - batch_size + 1, batch_size):
                batch = np.stack([
                    self._segment(self._load(self.paths[j]))
                    for j in order[i:i + batch_size]
                ])
                yield batch
                step += 1
                if num_steps is not None and step >= num_steps:
                    return

    def steps_per_epoch(self, batch_size: int) -> int:
        return max(1, len(self.paths) // batch_size)
