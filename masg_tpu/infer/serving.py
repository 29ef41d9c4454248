"""Production serving engine: bucketed, pre-compiled text->wav synthesis.

The reference has no serving story — inference is one-shot CLI scripts that
pay model construction + compile on every invocation (synthesize.py:104-131).
A TPU service cannot do that: XLA compiles one graph per input shape, so an
engine must (a) pad requests onto a small ladder of static (L_text, T_mel)
buckets and (b) compile every bucket up front, leaving only pure dispatch on
the request path. Each bucket's graph fuses the full pipeline — FastSpeech2
free-running forward (predicted durations) + HiFi-GAN/MelGAN vocoding — into
ONE jitted call, so a request costs a single device dispatch.

Pitch/energy/duration controls are traced as scalar *arrays*, not Python
floats, so changing a control never recompiles.

Thread safety: JAX dispatch is thread-safe, but the engine serializes calls
with a lock so concurrent HTTP handlers queue instead of interleaving device
work (see cli/serve.py).
"""

from __future__ import annotations

import contextlib
import threading
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ExperimentConfig
from ..models import FastSpeech2
from .synthesis import load_model, round_up
from .vocoder import Vocoder


def with_duration_bias(variables, value: float):
    """Return `variables` with the duration predictor's output bias shifted by
    `value` (log-duration space). An UNTRAINED model predicts
    round(exp(0)-1)=0 durations and free-runs to zero frames; value=ln(5)
    (~4 frames/phone after rounding) makes demos/benchmarks on fresh weights
    drive the exact trained-model graph at a realistic speech rate."""

    def set_bias(path, x):
        keys = [str(getattr(k, "key", k)) for k in path]
        if ("duration_predictor" in keys and "linear_layer" in keys
                and keys[-1] == "bias"):
            return x + np.asarray(value, x.dtype)
        return x

    return jax.tree_util.tree_map_with_path(set_bias, variables)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; raises if the request exceeds the ladder."""
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(
        f"request length {n} exceeds the largest text bucket {buckets[-1]}"
    )


class ServingEngine:
    """Pre-compiled synthesis service over one model + vocoder.

    Parameters
    ----------
    cfg: experiment config (the reference 3-file YAML dir, loaded).
    restore_step: checkpoint step to restore (0 = fresh params; mainly for
        tests, which inject `variables` instead).
    variables: optional explicit model variables (overrides restore_step).
    vocoder: a Vocoder, or None to emit raw mels only.
    text_buckets: ladder of padded phone lengths, ascending.
    frames_per_phone: mel-frame budget per phone; each text bucket L gets a
        mel cap of round_up(L * frames_per_phone, 128), clipped to
        max_seq_len (the decoder's PE/truncation limit, reference
        transformer/Models.py:166-174).
    mesh: optional jax.sharding.Mesh with a 'data' axis for multi-chip
        serving. Params (model + vocoder) are replicated over the mesh and
        each batched dispatch shards the request batch on 'data' — GSPMD
        partitions the whole fused text->wav graph across the slice, so
        throughput scales with chips without per-chip server processes.
        Batches not divisible by the data axis (including B=1) fall back to
        replicated compute: same numerics, no speedup. Pair with a
        DynamicBatcher / warmup ladder whose batch buckets are multiples of
        mesh.shape['data'].
    """

    def __init__(
        self,
        cfg: ExperimentConfig,
        restore_step: int = 0,
        variables=None,
        vocoder: Optional[Vocoder] = None,
        text_buckets: Sequence[int] = (16, 32, 64, 128),
        frames_per_phone: int = 12,
        dtype=jnp.float32,
        mesh=None,
    ):
        self.cfg = cfg
        self.vocoder = vocoder
        self.text_buckets = tuple(sorted(text_buckets))
        self.hop = cfg.preprocess.stft.hop_length
        self.sample_rate = cfg.preprocess.audio.sampling_rate
        self.meta_dim = cfg.preprocess.speaker_generation.one_hot_dim
        max_seq_len = cfg.model.max_seq_len

        self.model, loaded = load_model(cfg, restore_step, dtype=dtype)
        self.variables = variables if variables is not None else loaded
        self.mesh = mesh
        self._voc_params = vocoder.params if vocoder is not None else {}
        if vocoder is not None and dtype == jnp.bfloat16:
            # the fused graph feeds the bf16 postnet mel straight into the
            # vocoder convs; f32 kernels would dtype-mismatch in lax.conv
            self._voc_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                self._voc_params)
        if mesh is not None:
            from ..parallel.mesh import replicate

            self.variables = replicate(self.variables, mesh)
            self._voc_params = replicate(self._voc_params, mesh)

        self.mel_caps: Dict[int, int] = {
            L: min(max_seq_len, round_up(L * frames_per_phone, 128))
            for L in self.text_buckets
        }
        self._fns = {L: self._build(L, self.mel_caps[L]) for L in self.text_buckets}
        self._emb_fns = {
            L: self._build(L, self.mel_caps[L], from_emb=True)
            for L in self.text_buckets
        }
        # mel-only variants for the streaming path, built lazily (most
        # deployments never stream; don't double the warmup compile bill);
        # keyed (L, from_emb)
        self._mel_fns: Dict[Tuple[int, bool], object] = {}
        self._lock = threading.Lock()
        self.n_requests = 0
        self.n_batches = 0  # batched dispatches via synthesize_many
        # batch ladder synthesize_many/synthesize_chunked dispatch on; warmup
        # overwrites it with the EXACT sizes it compiled, so a warmed server
        # never pays a compile on the request path
        self.batch_buckets: Tuple[int, ...] = (1, 2, 4, 8)

    # ------------------------------------------------------------------
    def _build(self, L: int, T: int, from_emb: bool = False,
               mel_only: bool = False):
        model, vocoder = self.model, self.vocoder
        if mel_only:
            vocoder = None

        def fn(variables, voc_params, texts, src_lens, accents, spk, meta, controls):
            # (B, 3) per-request controls broadcast as (B, 1) against the
            # (B, L) predictions — a batched dispatch can mix control values
            p_c, e_c, d_c = controls[:, 0:1], controls[:, 1:2], controls[:, 2:3]
            if from_emb:
                out = model.apply(
                    variables, texts, src_lens, T, spk,
                    p_control=p_c, e_control=e_c, d_control=d_c,
                    accents=accents, method=FastSpeech2.synthesize_from_speaker_emb,
                )
            else:
                out = model.apply(
                    variables, spk, texts, src_lens, T,
                    p_control=p_c, e_control=e_c, d_control=d_c,
                    accents=accents, speaker_meta=meta,
                )
            if vocoder is None:
                return out.postnet_mel, out.mel_len
            wav = vocoder.generator.apply(
                {"params": voc_params}, out.postnet_mel * vocoder.mel_scale
            )
            return wav, out.mel_len

        return jax.jit(fn)

    def warmup(self, include_speaker_emb: bool = False,
               batch_sizes: Sequence[int] = (1,)) -> Dict[Tuple[int, int], float]:
        """Compile every (batch, text) bucket; returns compile seconds keyed
        (B, L). Pass the dynamic-batching ladder (e.g. (1, 2, 4, 8)) so no
        request ever pays a compile."""
        self.batch_buckets = tuple(sorted(set(batch_sizes)))
        times: Dict[Tuple[int, int], float] = {}
        for L in self.text_buckets:
            for B in batch_sizes:
                t0 = time.perf_counter()
                out, _ = self._run(
                    np.ones((B, L), np.int32), np.full(B, L, np.int32),
                    np.zeros((B, L), np.int32), speaker_id=0,
                )
                # host fetch = true execution barrier: dispatch is async, so
                # without it the FIRST REQUEST would absorb the executable +
                # params upload to the device (tens of seconds over a relay)
                _ = np.asarray(out).ravel()[:1]
                times[(B, L)] = time.perf_counter() - t0
            if include_speaker_emb:
                emb_dim = self.cfg.model.transformer.encoder_hidden
                out, _ = self._run(
                    np.ones((1, L), np.int32), np.asarray([L], np.int32),
                    np.zeros((1, L), np.int32),
                    speaker_emb=np.zeros((1, emb_dim), np.float32),
                )
                _ = np.asarray(out).ravel()[:1]
        return times

    # ------------------------------------------------------------------
    def _run(
        self,
        texts: np.ndarray,
        src_lens: np.ndarray,
        accents: np.ndarray,
        speaker_id: int = 0,
        speaker_meta: Optional[np.ndarray] = None,
        speaker_emb: Optional[np.ndarray] = None,
        controls: Tuple[float, float, float] = (1.0, 1.0, 1.0),
        mel_only: bool = False,
    ):
        L = texts.shape[1]
        voc_params = self._voc_params
        c = np.asarray(controls, np.float32)
        if c.ndim == 1:  # shared controls -> one row per batch item
            c = np.tile(c, (texts.shape[0], 1))
        c = jnp.asarray(c)
        from_emb = speaker_emb is not None
        if mel_only:
            key = (L, from_emb)
            if key not in self._mel_fns:
                self._mel_fns[key] = self._build(
                    L, self.mel_caps[L], from_emb=from_emb, mel_only=True)
            fn = self._mel_fns[key]
        else:
            fn = self._emb_fns[L] if from_emb else self._fns[L]
        if from_emb:
            spk = jnp.asarray(speaker_emb, jnp.float32)
            meta = jnp.zeros((texts.shape[0], self.meta_dim), jnp.float32)
        else:
            spk = np.asarray(speaker_id, np.int32)
            if spk.ndim == 0:
                spk = np.full((texts.shape[0],), spk, np.int32)
            spk = jnp.asarray(spk)
            meta = (
                jnp.asarray(speaker_meta, jnp.float32)
                if speaker_meta is not None
                else jnp.zeros((texts.shape[0], self.meta_dim), jnp.float32)
            )
        args = (jnp.asarray(texts), jnp.asarray(src_lens), jnp.asarray(accents),
                jnp.asarray(spk), meta, c)
        if self.mesh is not None:
            args = self._place_dp(*args)
        return fn(self.variables, voc_params, *args)

    def _place_dp(self, *arrays):
        """Place request arrays on the mesh: batch dim sharded over 'data'
        when it divides evenly, replicated otherwise (B=1 latency path).
        With params replicated, GSPMD partitions the fused graph so each
        device synthesizes B/n_data requests. Goes through place_global so a
        multi-host mesh (non-addressable devices) works like the param path."""
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import place_global

        n_data = self.mesh.shape["data"]
        placed = []
        for x in arrays:
            x = jnp.asarray(x)
            spec = (P("data") if x.ndim >= 1 and x.shape[0] % n_data == 0
                    else P())
            placed.append(place_global(x, self.mesh, spec))
        return tuple(placed)

    # ------------------------------------------------------------------
    def _pad_request(self, ids, accent_ids):
        """Pad ids/accents onto the smallest fitting text bucket; unspecified
        accent tails degrade to NO_ACCENT_ID (shared by synthesize /
        synthesize_streaming / synthesize_many)."""
        from ..text import NO_ACCENT_ID

        n = len(ids)
        if n == 0:
            raise ValueError("empty phone sequence")
        L = pick_bucket(n, self.text_buckets)
        texts = np.zeros((1, L), np.int32)
        texts[0, :n] = np.asarray(ids, np.int32)
        acc = np.zeros((1, L), np.int32)
        if accent_ids is not None:
            m = min(len(accent_ids), n)
            acc[0, :m] = np.asarray(accent_ids[:m], np.int32)
            acc[0, m:n] = NO_ACCENT_ID
        else:
            acc[0, :n] = NO_ACCENT_ID
        return texts, np.asarray([n], np.int32), acc, L

    # ------------------------------------------------------------------
    def synthesize(
        self,
        ids: Sequence[int],
        accent_ids: Optional[Sequence[int]] = None,
        speaker_id: int = 0,
        speaker_meta: Optional[np.ndarray] = None,
        speaker_emb: Optional[np.ndarray] = None,
        pitch_control: float = 1.0,
        energy_control: float = 1.0,
        duration_control: float = 1.0,
    ) -> Dict[str, object]:
        """One utterance -> int16 wav (or mel when built without a vocoder).

        Returns {"wav" or "mel", "mel_len", "sample_rate", "latency_s",
        "bucket"}. Pads onto the smallest fitting text bucket and truncates
        the output to mel_len frames (* hop samples).

        Tail semantics: the fused fixed-shape graph vocodes the FULL padded
        mel and trims the wav, so the last ~receptive-field (~15 frames *
        hop) samples reflect the free-running frames past mel_len;
        synthesize_streaming instead vocodes the mel trimmed to mel_len
        (the reference pipeline's semantics, utils/model.py:74-92) — the
        two can differ inaudibly in that trailing window.
        """
        texts, src_lens, acc, L = self._pad_request(ids, accent_ids)

        t0 = time.perf_counter()
        with self._lock:
            out, mel_len = self._run(
                texts, src_lens, acc, speaker_id, speaker_meta, speaker_emb,
                (pitch_control, energy_control, duration_control),
            )
            mel_len = int(np.asarray(mel_len)[0])
            out = np.asarray(out[0], np.float32)
            self.n_requests += 1  # guarded: int += is not atomic across threads
        latency = time.perf_counter() - t0

        result = {
            "mel_len": mel_len,
            "sample_rate": self.sample_rate,
            "latency_s": latency,
            "bucket": L,
        }
        if self.vocoder is None:
            result["mel"] = out[:mel_len]
        else:
            wav = (out[: mel_len * self.hop] * self.vocoder.max_wav_value)
            result["wav"] = np.clip(wav, -32768, 32767).astype(np.int16)
        return result

    # ------------------------------------------------------------------
    def synthesize_streaming(
        self,
        ids: Sequence[int],
        accent_ids: Optional[Sequence[int]] = None,
        speaker_id: int = 0,
        speaker_meta: Optional[np.ndarray] = None,
        speaker_emb: Optional[np.ndarray] = None,
        pitch_control: float = 1.0,
        energy_control: float = 1.0,
        duration_control: float = 1.0,
        chunk_frames: int = 192,
        context_frames: Optional[int] = None,
    ):
        """Generator of int16 PCM chunks: the acoustic model runs once
        (mel-only jit, compiled lazily per bucket), then the vocoder streams
        receptive-field-exact windows (infer.vocoder.vocode_streaming) — the
        first audio arrives after ONE vocoder window instead of the full
        utterance's vocode, and memory stays bounded for long syntheses.
        The concatenated chunks equal vocoding the trimmed mel in one shot
        (the reference pipeline's semantics, utils/model.py:74-92; see the
        tail-semantics note on synthesize())."""
        from .vocoder import vocode_streaming

        if self.vocoder is None:
            raise ValueError("streaming synthesis requires a vocoder")
        texts, src_lens, acc, L = self._pad_request(ids, accent_ids)

        with self._lock:
            mel, mel_len = self._run(
                texts, src_lens, acc, speaker_id, speaker_meta, speaker_emb,
                (pitch_control, energy_control, duration_control),
                mel_only=True,
            )
            mel_len = int(np.asarray(mel_len)[0])
            mel = np.asarray(mel[0, :mel_len], np.float32)
            self.n_requests += 1
        yield from vocode_streaming(
            self.vocoder, jnp.asarray(mel[None]), chunk_frames, context_frames)

    # ------------------------------------------------------------------
    def synthesize_many(self, requests: List[dict],
                        batch_buckets: Optional[Sequence[int]] = None,
                        ) -> List[Dict[str, object]]:
        """Fuse N speaker-id requests into ONE device dispatch.

        Each request is the kwargs of `synthesize` (speaker_emb not
        supported — those go through the per-request path). All texts pad to
        the largest needed text bucket; the batch pads to the next batch
        bucket by replicating row 0 (pad outputs are discarded), so compile
        count stays len(text_buckets) x len(batch_buckets).
        """
        from ..text import NO_ACCENT_ID

        if not requests:
            return []
        for r in requests:
            if r.get("speaker_emb") is not None:
                raise ValueError("synthesize_many: speaker_emb path not batchable")
            if len(r["ids"]) == 0:  # len(): ids may be a numpy array
                raise ValueError("empty phone sequence")
        L = pick_bucket(max(len(r["ids"]) for r in requests), self.text_buckets)
        n = len(requests)
        B = pick_bucket(n, batch_buckets or self.batch_buckets)

        texts = np.zeros((B, L), np.int32)
        acc = np.zeros((B, L), np.int32)
        src_lens = np.ones(B, np.int32)
        spk = np.zeros(B, np.int32)
        meta = np.zeros((B, self.meta_dim), np.float32)
        controls = np.ones((B, 3), np.float32)
        for i, r in enumerate(requests):
            ids = r["ids"]
            k = len(ids)
            texts[i, :k] = np.asarray(ids, np.int32)
            a = r.get("accent_ids")
            if a is not None:
                m = min(len(a), k)
                acc[i, :m] = np.asarray(a[:m], np.int32)
                acc[i, m:k] = NO_ACCENT_ID  # short accents degrade to no-accent
            else:
                acc[i, :k] = NO_ACCENT_ID
            src_lens[i] = k
            spk[i] = int(r.get("speaker_id", 0))
            if r.get("speaker_meta") is not None:
                meta[i] = np.asarray(r["speaker_meta"], np.float32).reshape(-1)
            controls[i] = (r.get("pitch_control", 1.0),
                           r.get("energy_control", 1.0),
                           r.get("duration_control", 1.0))
        for i in range(n, B):  # pad rows: replicate row 0, discard outputs
            texts[i], acc[i], src_lens[i] = texts[0], acc[0], src_lens[0]
            spk[i], meta[i], controls[i] = spk[0], meta[0], controls[0]

        t0 = time.perf_counter()
        with self._lock:
            out, mel_len = self._run(texts, src_lens, acc, spk, meta, None,
                                     controls)
            mel_len = np.asarray(mel_len)
            out = np.asarray(out, np.float32)
            self.n_requests += n
            self.n_batches += 1
        latency = time.perf_counter() - t0

        results = []
        for i in range(n):
            # clamp to the request's OWN bucket cap: co-batched longer texts
            # raise the graph's T, and without this a saturating request
            # would return different-length audio than the single path
            own_cap = self.mel_caps[pick_bucket(len(requests[i]["ids"]),
                                                self.text_buckets)]
            ml = min(int(mel_len[i]), own_cap)
            r = {"mel_len": ml, "sample_rate": self.sample_rate,
                 "latency_s": latency, "bucket": L, "batch": n}
            if self.vocoder is None:
                r["mel"] = out[i, :ml]
            else:
                wav = out[i, : ml * self.hop] * self.vocoder.max_wav_value
                r["wav"] = np.clip(wav, -32768, 32767).astype(np.int16)
            results.append(r)
        return results


    # ------------------------------------------------------------------
    def synthesize_chunked(self, ids, accent_ids=None, **kwargs
                           ) -> Dict[str, object]:
        """Serve a text LONGER than the largest bucket: split at pause
        phones (infer.synthesis.chunk_phone_ids), run the chunks as one
        batched dispatch over the pre-compiled buckets (synthesize_many),
        stitch the audio in order. Seams land on silence."""
        from .synthesis import chunk_phone_ids

        if len(list(ids)) == 0:
            raise ValueError("empty phone sequence")
        chunks = chunk_phone_ids(list(ids), accent_ids,
                                 max_phones=self.text_buckets[-1])
        reqs = [dict(kwargs, ids=c, accent_ids=a) for c, a in chunks]
        stride = self.batch_buckets[-1]  # groups ride the warmed ladder
        parts, latency = [], 0.0
        for i in range(0, len(reqs), stride):
            group = self.synthesize_many(reqs[i:i + stride])
            latency += group[0]["latency_s"]  # one dispatch per group
            parts.extend(group)
        key = "mel" if self.vocoder is None else "wav"
        joined = np.concatenate([p[key] for p in parts], axis=0)
        return {
            key: joined,
            "mel_len": int(sum(p["mel_len"] for p in parts)),
            "sample_rate": self.sample_rate,
            "latency_s": latency,
            "bucket": max(p["bucket"] for p in parts),
            "n_chunks": len(parts),
        }


class ServerOverloaded(RuntimeError):
    """Batcher queue is at its depth cap — shed the request instead of
    letting queue latency grow without bound. `retry_after_s` estimates when
    capacity frees up (queue depth x recent per-request service time)."""

    def __init__(self, depth: int, max_queue: int, retry_after_s: float):
        super().__init__(
            f"server overloaded: queue depth {depth} >= cap {max_queue}")
        self.retry_after_s = retry_after_s


class RequestTimeout(RuntimeError):
    """Request exceeded its deadline while queued or in flight."""


class DynamicBatcher:
    """Transparent request batcher in front of a ServingEngine.

    Concurrent `synthesize` calls arriving within `window_ms` of each other
    fuse into one batched device dispatch (up to `max_batch`); a lone request
    dispatches immediately after the window. The TPU runs one graph either
    way, so batching multiplies throughput under load at ~window_ms added
    latency. speaker_emb requests bypass the batcher (un-batchable path).

    Overload behavior: with `max_queue` set, requests arriving at a full
    queue raise ServerOverloaded (HTTP layer: 503 + Retry-After) instead of
    queuing unboundedly; with `request_timeout_s` set, a request that cannot
    finish inside its deadline raises RequestTimeout (HTTP 504) — expired
    requests still in the queue are shed without spending device time, and
    dead entries never trigger sheds of live traffic. Un-batchable surfaces
    (speaker_emb, synthesize_chunked, synthesize_streaming) shed through
    bypass_guard against the same max_queue cap, so overload protection
    covers every path. An in-flight request that overruns its deadline gets
    one dispatch-scale grace period (its device time is already spent)
    before 504ing, counted in n_timeout_inflight.
    """

    def __init__(self, engine: ServingEngine, max_batch: int = 8,
                 window_ms: float = 5.0, max_queue: Optional[int] = None,
                 request_timeout_s: Optional[float] = None):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        if max_queue is not None and max_queue < 1:
            raise ValueError("max_queue must be >= 1")
        self.engine = engine
        self.max_batch = max_batch
        self.window_s = window_ms / 1e3
        self.max_queue = max_queue
        self.request_timeout_s = request_timeout_s
        # EMA of per-request service time, for the Retry-After estimate;
        # seeded pessimistically (one un-batched dispatch is ~100 ms through
        # the tunnel) and corrected by the first real batch
        self._ema_s_per_req = 0.1
        self.n_shed_overload = 0
        self.n_shed_timeout = 0
        # caller-side deadline overruns of requests that were already in
        # flight (device time was spent; the 504 is still surfaced)
        self.n_timeout_inflight = 0
        # concurrent un-batchable bypass requests (streaming, chunked long
        # text, speaker_emb) currently holding the engine; capped by
        # max_queue so the overload protection covers the bypass paths too
        self._n_bypass = 0
        self._buckets = [1]
        while self._buckets[-1] < max_batch:
            self._buckets.append(self._buckets[-1] * 2)
        self._queue: List[Tuple[dict, "threading.Event", dict]] = []
        self._mutex = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._worker = threading.Thread(target=self._drain_loop, daemon=True)
        self._worker.start()

    def close(self):
        # set _stop under the mutex so no submitter can pass its _stop check
        # and append after the leftover drain below (close/submit race)
        with self._mutex:
            self._stop = True
        self._wake.set()
        self._worker.join(timeout=5)
        # fail any request that was still queued: a caller blocked on
        # done.wait() must never hang forever
        with self._mutex:
            leftovers, self._queue = self._queue, []
        for _, done, slot in leftovers:
            slot["error"] = RuntimeError("DynamicBatcher closed")
            done.set()

    def __getattr__(self, name):
        # passthrough (mel_caps, text_buckets, n_requests, ...) so the HTTP
        # layer can front either an engine or a batcher
        return getattr(self.engine, name)

    # un-batchable surfaces are wrapped explicitly (NOT passthrough) so the
    # overload shed covers them too — see bypass_guard
    def synthesize_chunked(self, ids, **kwargs) -> Dict[str, object]:
        with self.bypass_guard():
            return self.engine.synthesize_chunked(ids, **kwargs)

    def synthesize_streaming(self, ids, **kwargs):
        # the guard is held for the generator's lifetime: streaming spends
        # device time on every pull, not just at creation
        with self.bypass_guard():
            yield from self.engine.synthesize_streaming(ids, **kwargs)

    @contextlib.contextmanager
    def bypass_guard(self):
        """Overload shed for requests that bypass the batch queue (streaming,
        chunked long text, speaker_emb): counts concurrent bypass requests
        against max_queue and raises ServerOverloaded past the cap, so the
        503+Retry-After contract holds on every path, not just /synthesize."""
        if self.max_queue is None:
            yield
            return
        with self._mutex:
            if self._n_bypass >= self.max_queue:
                self.n_shed_overload += 1
                retry = max(1.0, self._n_bypass * self._ema_s_per_req)
                raise ServerOverloaded(self._n_bypass, self.max_queue, retry)
            self._n_bypass += 1
        try:
            yield
        finally:
            with self._mutex:
                self._n_bypass -= 1

    def synthesize(self, ids, **kwargs) -> Dict[str, object]:
        if kwargs.get("speaker_emb") is not None:
            with self.bypass_guard():
                return self.engine.synthesize(ids, **kwargs)
        ids = list(ids)
        # validate NOW, against this caller only — a bad request raised
        # inside the worker would otherwise fail every co-batched request
        if len(ids) == 0:
            raise ValueError("empty phone sequence")
        pick_bucket(len(ids), self.engine.text_buckets)  # raises on oversize
        req = dict(kwargs, ids=ids)
        done = threading.Event()
        slot: dict = {}
        if self.request_timeout_s is not None:
            slot["deadline"] = time.monotonic() + self.request_timeout_s
        expired = []
        with self._mutex:
            # checked under the mutex: close() flips _stop under the same
            # lock before draining, so we either enqueue-before-drain (and
            # get failed by close) or raise here — never hang
            if self._stop:
                raise RuntimeError("DynamicBatcher closed")
            if self.max_queue is not None and len(self._queue) >= self.max_queue:
                # dead entries (callers already timed out) must not trigger
                # spurious sheds: prune them before comparing against the cap
                if self.request_timeout_s is not None:
                    now = time.monotonic()
                    live = []
                    for item in self._queue:
                        if item[2].get("deadline", now + 1) < now:
                            expired.append(item)
                        else:
                            live.append(item)
                    self._queue = live
                if len(self._queue) >= self.max_queue:
                    self.n_shed_overload += 1
                    retry = max(1.0, len(self._queue) * self._ema_s_per_req)
                    raise ServerOverloaded(len(self._queue), self.max_queue,
                                           retry)
            self._queue.append((req, done, slot))
        for _, edone, eslot in expired:
            self.n_shed_timeout += 1
            eslot["error"] = RequestTimeout(
                f"request expired after {self.request_timeout_s}s in queue")
            edone.set()
        self._wake.set()
        # wait slightly past the deadline: in-flight completion beats raising
        if not done.wait(None if self.request_timeout_s is None
                         else self.request_timeout_s + self.window_s):
            if slot.get("dispatched"):
                # the request is already consuming device time; give it one
                # dispatch-scale grace so 'in-flight completion beats
                # raising' actually holds (a 5 ms window is far below a
                # batch dispatch)
                grace = max(1.0, self._ema_s_per_req * self.max_batch * 2)
                if not done.wait(grace):
                    self.n_timeout_inflight += 1
                    raise RequestTimeout(
                        f"request exceeded {self.request_timeout_s}s "
                        f"(+{grace:.1f}s in-flight grace, still finishing)")
            else:
                raise RequestTimeout(
                    f"request exceeded {self.request_timeout_s}s "
                    f"(still queued)")
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    def _drain_loop(self):
        while not self._stop:
            self._wake.wait()
            if self._stop:
                return
            time.sleep(self.window_s)  # let concurrent arrivals accumulate
            now = time.monotonic()
            expired = []
            with self._mutex:
                # shed already-expired requests WITHOUT spending device time
                # on them — their callers have raised (or are about to)
                if self.request_timeout_s is not None:
                    live = []
                    for item in self._queue:
                        if item[2].get("deadline", now + 1) < now:
                            expired.append(item)
                        else:
                            live.append(item)
                    self._queue = live
                batch = self._queue[: self.max_batch]
                del self._queue[: self.max_batch]
                for _, _, slot in batch:
                    # callers distinguish queued (hard 504) from in-flight
                    # (grace) timeouts by this marker
                    slot["dispatched"] = True
                if not self._queue:
                    self._wake.clear()
            for _, done, slot in expired:
                self.n_shed_timeout += 1
                slot["error"] = RequestTimeout(
                    f"request expired after {self.request_timeout_s}s in queue")
                done.set()
            if not batch:
                continue
            try:
                t0 = time.monotonic()
                results = self.engine.synthesize_many(
                    [r for r, _, _ in batch], batch_buckets=tuple(self._buckets))
                dt = (time.monotonic() - t0) / len(batch)
                self._ema_s_per_req += 0.2 * (dt - self._ema_s_per_req)
                for (_, done, slot), res in zip(batch, results):
                    slot["result"] = res
                    done.set()
            except Exception as e:
                for _, done, slot in batch:
                    slot["error"] = e
                    done.set()
