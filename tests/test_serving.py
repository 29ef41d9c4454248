"""Serving subsystem: bucketed pre-compiled engine + HTTP server.

Uses a tiny model with the duration-predictor output bias nudged to ln(5)
(same trick as bench.py) so an untrained model free-runs at a realistic
~4 frames/phone instead of the zero-duration quirk.
"""

import json
import math
import threading
import time
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_fastspeech2 import tiny_config



def _biased_variables(model, cfg, L=16):
    from masg_tpu.infer.serving import with_duration_bias

    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros(1, jnp.int32), jnp.ones((1, L), jnp.int32),
        jnp.asarray([L], jnp.int32), 64,
        accents=jnp.zeros((1, L), jnp.int32),
        speaker_meta=jnp.zeros((1, cfg.preprocess.speaker_generation.one_hot_dim)),
    )
    return with_duration_bias(variables, math.log(5.0))


@pytest.fixture(scope="module")
def engine():
    from masg_tpu.infer.serving import ServingEngine
    from masg_tpu.infer.vocoder import Vocoder
    from masg_tpu.models import FastSpeech2
    from masg_tpu.models.hifigan import HiFiGANGenerator

    cfg = tiny_config()
    model = FastSpeech2.from_config(cfg)
    variables = _biased_variables(model, cfg)

    # small vocoder for CPU test speed; architecture identical
    gen = HiFiGANGenerator(upsample_initial_channel=32)
    voc_params = gen.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 8, 80)))["params"]
    voc = Vocoder(gen, voc_params)

    return ServingEngine(
        cfg, variables=variables, vocoder=voc,
        text_buckets=(16, 32), frames_per_phone=8,
    )


@pytest.mark.smoke
def test_pick_bucket():
    from masg_tpu.infer.serving import pick_bucket

    assert pick_bucket(9, (16, 32)) == 16
    assert pick_bucket(16, (16, 32)) == 16
    assert pick_bucket(17, (16, 32)) == 32
    with pytest.raises(ValueError, match="exceeds"):
        pick_bucket(33, (16, 32))


def test_engine_synthesize_wav(engine):
    r = engine.synthesize([5, 6, 7, 8, 9, 10, 11, 12, 13])
    assert r["bucket"] == 16
    assert r["mel_len"] > 0
    # free-running ~4 frames/phone after round(exp(log5)-1)
    assert 9 <= r["mel_len"] <= 16 * 8
    assert r["wav"].dtype == np.int16
    assert r["wav"].shape == (r["mel_len"] * 256,)
    assert r["sample_rate"] == 22050


def test_engine_controls_and_determinism(engine):
    ids = list(range(5, 14))
    a = engine.synthesize(ids)
    b = engine.synthesize(ids)
    assert a["mel_len"] == b["mel_len"]
    assert np.array_equal(a["wav"], b["wav"])
    # duration_control scales the predicted durations (shrink, since the
    # untrained predictor's output already saturates the bucket's mel cap)
    fast = engine.synthesize(ids, duration_control=0.05)
    assert 0 < fast["mel_len"] < a["mel_len"]
    # controls/speakers are traced dynamically: no recompile per request
    assert engine._fns[16]._cache_size() == 1


def test_engine_speaker_emb_path(engine):
    emb_dim = engine.cfg.model.transformer.encoder_hidden
    r = engine.synthesize(
        [5, 6, 7, 8], speaker_emb=np.zeros((1, emb_dim), np.float32)
    )
    assert r["mel_len"] > 0 and r["wav"].size == r["mel_len"] * 256


def test_engine_rejects_oversize(engine):
    with pytest.raises(ValueError, match="exceeds"):
        engine.synthesize(list(range(1, 40)))


def test_mel_only_engine():
    from masg_tpu.infer.serving import ServingEngine
    from masg_tpu.models import FastSpeech2

    cfg = tiny_config()
    model = FastSpeech2.from_config(cfg)
    eng = ServingEngine(
        cfg, variables=_biased_variables(model, cfg),
        vocoder=None, text_buckets=(16,), frames_per_phone=8,
    )
    r = eng.synthesize([5, 6, 7])
    assert "wav" not in r
    assert r["mel"].shape == (r["mel_len"], 80)
    assert np.isfinite(r["mel"]).all()


@pytest.fixture(scope="module")
def server(engine):
    from masg_tpu.cli.serve import make_server

    srv = make_server(engine, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/synthesize", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        resp = urllib.request.urlopen(req, timeout=120)
        return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def test_http_health(server):
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    assert h["buckets"]["16"] == 128  # round_up(16*8, 128)


def test_http_synthesize_wav(server):
    import io
    import wave

    code, headers, body = _post(server, {"phones": "{a i u e o a i u e o}"})
    assert code == 200
    assert headers["Content-Type"] == "audio/wav"
    with wave.open(io.BytesIO(body)) as w:
        assert w.getframerate() == 22050
        assert w.getnchannels() == 1
        assert w.getnframes() > 0
    assert int(headers["X-Mel-Len"]) * 256 == w.getnframes()


def test_http_synthesize_json(server):
    code, _, body = _post(
        server, {"phones": "{a i u}", "format": "json", "speaker_id": 1}
    )
    assert code == 200
    r = json.loads(body)
    assert r["mel_len"] > 0 and r["wav_b64"]


def test_http_bad_request(server):
    code, _, body = _post(server, {"nonsense": True})
    assert code == 400
    assert "phones" in json.loads(body)["error"]

    # unknown accent char / phone symbol = client error, not a 500
    code, _, body = _post(server, {"phones": "{a i}", "accents": "zz"})
    assert code == 400
    assert "unknown symbol" in json.loads(body)["error"]
    code, _, _ = _post(server, {"phones": "{a notaphone}"})
    assert code == 400


def test_http_mel_only_response_metadata():
    """A --no_vocoder server's JSON carries sample_rate + n_mels so clients
    can reshape/resynthesize without hard-coding the feature schema."""
    from masg_tpu.cli.serve import make_server
    from masg_tpu.infer.serving import ServingEngine
    from masg_tpu.models import FastSpeech2

    cfg = tiny_config()
    model = FastSpeech2.from_config(cfg)
    eng = ServingEngine(
        cfg, variables=_biased_variables(model, cfg),
        vocoder=None, text_buckets=(16,), frames_per_phone=8,
    )
    srv = make_server(eng, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        code, _, body = _post(url, {"phones": "{a i u}"})
        assert code == 200
        r = json.loads(body)
        assert r["sample_rate"] == 22050 and r["n_mels"] == 80
        import base64

        mel = np.frombuffer(base64.b64decode(r["mel_b64"]), np.float32)
        assert mel.size == r["mel_len"] * r["n_mels"]
    finally:
        srv.shutdown()


def test_synthesize_many_matches_single(engine):
    """One fused dispatch over N requests reproduces the per-request path,
    including mixed per-request controls in the same batch."""
    reqs = [
        {"ids": [5, 6, 7, 8, 9], "speaker_id": 0},
        {"ids": [10, 11, 12], "speaker_id": 1, "duration_control": 0.05},
        {"ids": list(range(5, 14)), "speaker_id": 2, "pitch_control": 1.3},
    ]
    batched = engine.synthesize_many(reqs)  # n=3 -> pads to batch bucket 4
    assert all(r["batch"] == 3 for r in batched)
    for r, b in zip(reqs, batched):
        kw = {k: v for k, v in r.items() if k != "ids"}
        single = engine.synthesize(r["ids"], **kw)
        assert single["mel_len"] == b["mel_len"], (single["mel_len"], b["mel_len"])
        np.testing.assert_allclose(b["wav"], single["wav"], atol=2)


def test_synthesize_many_rejects_emb_path(engine):
    with pytest.raises(ValueError, match="not batchable"):
        engine.synthesize_many([{"ids": [5], "speaker_emb": np.zeros((1, 8))}])


def test_dynamic_batcher_concurrent_requests(engine):
    """Concurrent requests fuse into fewer dispatches with identical results."""
    from concurrent.futures import ThreadPoolExecutor

    from masg_tpu.infer.serving import DynamicBatcher

    # generous window: the assertion below needs all 4 pool threads enqueued
    # inside it, and CI boxes can space thread startup by tens of ms
    batcher = DynamicBatcher(engine, max_batch=4, window_ms=250.0)
    try:
        ids_list = [[5, 6, 7], [8, 9, 10, 11], [12, 13], [5, 9, 13]]
        singles = [engine.synthesize(ids) for ids in ids_list]
        req0, batch0 = engine.n_requests, engine.n_batches
        with ThreadPoolExecutor(4) as pool:
            got = list(pool.map(batcher.synthesize, ids_list))
        assert engine.n_requests - req0 == 4
        n_dispatches = engine.n_batches - batch0
        assert 1 <= n_dispatches < 4, n_dispatches  # actually batched
        for s, g in zip(singles, got):
            assert s["mel_len"] == g["mel_len"]
            np.testing.assert_allclose(s["wav"], g["wav"], atol=2)
        # health passthrough fields
        assert batcher.sample_rate == engine.sample_rate
        assert batcher.mel_caps == engine.mel_caps
    finally:
        batcher.close()


def test_dynamic_batcher_validation_and_close(engine):
    """A bad request fails only its own caller (validated at enqueue, never
    poisoning co-batched requests), and close() never strands a waiter."""
    from masg_tpu.infer.serving import DynamicBatcher

    batcher = DynamicBatcher(engine, max_batch=4, window_ms=5.0)
    with pytest.raises(ValueError, match="empty"):
        batcher.synthesize([])
    with pytest.raises(ValueError, match="exceeds"):
        batcher.synthesize(list(range(1, 40)))
    r = batcher.synthesize([5, 6, 7])  # still serving after rejections
    assert r["mel_len"] > 0
    batcher.close()
    with pytest.raises(RuntimeError, match="closed"):
        batcher.synthesize([5, 6, 7])


def test_http_overlength_text_chunks(server):
    """A text longer than the largest bucket (32 here) no longer 400s: it
    chunks at pause phones, batches over the pre-compiled buckets, and
    returns the stitched audio."""
    import io
    import wave

    phones = " ".join((["a"] * 20 + ["sp"]) * 3)  # 63 phones, pauses at 21/42
    code, headers, body = _post(server, {"phones": "{" + phones + "}"})
    assert code == 200
    assert headers["Content-Type"] == "audio/wav"
    with wave.open(io.BytesIO(body)) as w:
        assert w.getnframes() == int(headers["X-Mel-Len"]) * 256


def test_engine_synthesize_chunked_matches_parts(engine):
    ids = list(range(5, 25)) + [420] + list(range(30, 55))  # 46 phones, sp pause
    r = engine.synthesize_chunked(ids)
    assert r["n_chunks"] >= 2
    assert r["wav"].shape == (r["mel_len"] * 256,)
    # equals the stitch of the same chunks run through synthesize_many
    from masg_tpu.infer.synthesis import chunk_phone_ids

    chunks = chunk_phone_ids(ids, max_phones=engine.text_buckets[-1])
    parts = engine.synthesize_many([{"ids": c} for c, _ in chunks])
    np.testing.assert_array_equal(
        r["wav"], np.concatenate([p["wav"] for p in parts]))


def test_synthesize_many_own_bucket_cap(engine):
    """A saturating request co-batched with a longer text must truncate at
    its OWN bucket's mel cap, like the single-request path."""
    sat = {"ids": list(range(5, 16)), "duration_control": 50.0}  # saturates
    single = engine.synthesize(sat["ids"], duration_control=50.0)
    assert single["mel_len"] == engine.mel_caps[16]  # proves saturation
    long_req = {"ids": list(range(5, 30))}  # forces the L=32 bucket
    batched = engine.synthesize_many([sat, long_req])
    assert batched[0]["mel_len"] == single["mel_len"]


def test_engine_streaming_matches_one_shot(engine):
    """synthesize_streaming: concatenated PCM equals vocoding the trimmed
    mel in one shot (the reference pipeline's semantics), within 1 int16
    LSB of chunked-conv reassociation."""
    from masg_tpu.infer.vocoder import vocoder_infer

    ids = list(range(5, 14))
    chunks = list(engine.synthesize_streaming(ids, chunk_frames=24,
                                              context_frames=8))
    stream = np.concatenate(chunks)
    assert len(chunks) >= 2  # actually streamed

    # reference target: run the mel-only path, vocode the TRIMMED mel
    # (accents: the engine fills NO_ACCENT_ID for unspecified — rebuild)
    from masg_tpu.text import NO_ACCENT_ID

    acc = np.zeros((1, 16), np.int32)
    acc[0, : len(ids)] = NO_ACCENT_ID
    texts = np.zeros((1, 16), np.int32)
    texts[0, : len(ids)] = ids
    mel, mel_len = engine._run(texts, np.asarray([len(ids)], np.int32), acc,
                               mel_only=True)
    mel_len = int(np.asarray(mel_len)[0])
    full = vocoder_infer(jnp.asarray(np.asarray(mel)[:, :mel_len]),
                         engine.vocoder)[0]
    assert stream.shape == full.shape
    diff = np.abs(stream.astype(np.int32) - full.astype(np.int32))
    assert diff.max() <= 1


def test_http_streaming_endpoint(server, engine):
    """/synthesize_streaming returns chunked audio/wav whose PCM equals the
    engine's streaming output."""
    payload = {"phones": "{a b c d e f g h i}"}
    req = urllib.request.Request(
        server + "/synthesize_streaming", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "audio/wav"
        body = resp.read()  # urllib reassembles the chunked transfer
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    pcm = np.frombuffer(body[44:], np.int16)
    assert pcm.size > 0

    ids, _ = __import__("masg_tpu.cli.serve", fromlist=["request_to_ids"]
                        ).request_to_ids(payload)
    direct = np.concatenate(list(engine.synthesize_streaming(ids)))
    assert np.array_equal(pcm, direct)


def test_http_streaming_bad_input(server):
    req = urllib.request.Request(
        server + "/synthesize_streaming",
        data=json.dumps({"phones": "{}"}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        resp = urllib.request.urlopen(req, timeout=60)
        code = resp.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400


def test_engine_streaming_speaker_emb(engine):
    """Streaming honors speaker embeddings: the mel-only emb bucket fn is
    selected and the embedding changes the acoustic output. (Audio-level
    comparison is vacuous here: the fixture's random tiny vocoder emits
    near-constant audio for ANY mel, so assert on the mels.)"""
    emb_dim = engine.cfg.model.transformer.encoder_hidden
    emb = np.full((1, emb_dim), 0.1, np.float32)
    ids = list(range(5, 14))
    texts, sl, acc, L = engine._pad_request(ids, None)
    mel_plain, _ = engine._run(texts, sl, acc, mel_only=True)
    mel_emb, _ = engine._run(texts, sl, acc, speaker_emb=emb, mel_only=True)
    assert float(np.abs(np.asarray(mel_plain) - np.asarray(mel_emb)).max()) > 1e-3
    assert (L, True) in engine._mel_fns  # the emb-variant bucket compiled

    wav = np.concatenate(list(engine.synthesize_streaming(
        ids, speaker_emb=emb, chunk_frames=24, context_frames=8)))
    assert wav.size > 0 and wav.dtype == np.int16


def test_http_streaming_long_text(server):
    """Texts beyond the largest bucket stream via the pause-chunked
    synthesis fallback instead of 400ing."""
    phones = " ".join(["a b c d e f g sp"] * 5)  # 40 phones > bucket 32
    req = urllib.request.Request(
        server + "/synthesize_streaming",
        data=json.dumps({"phones": "{" + phones + "}"}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        assert resp.status == 200
        body = resp.read()
    assert body[:4] == b"RIFF"
    assert np.frombuffer(body[44:], np.int16).size > 0


def test_http_streaming_speaker_emb(server, engine):
    emb_dim = engine.cfg.model.transformer.encoder_hidden
    req = urllib.request.Request(
        server + "/synthesize_streaming",
        data=json.dumps({"phones": "{a b c d e}",
                         "speaker_emb": [0.1] * emb_dim}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        assert resp.status == 200
        body = resp.read()
    assert np.frombuffer(body[44:], np.int16).size > 0


class _GatedEngine:
    """Minimal engine stub whose dispatch blocks on an event — lets the
    overload tests hold the batcher's worker mid-flight deterministically."""

    text_buckets = (16,)
    mel_caps = {16: 64}
    sample_rate = 22050

    def __init__(self):
        self.gate = threading.Event()
        self.inflight = threading.Event()
        self.n_requests = 0
        self.n_batches = 0

    def synthesize_many(self, reqs, batch_buckets=None):
        self.inflight.set()
        assert self.gate.wait(10), "test gate never opened"
        self.n_requests += len(reqs)
        self.n_batches += 1
        return [{"mel_len": 4, "wav": np.zeros(16, np.int16),
                 "sample_rate": self.sample_rate, "latency_s": 0.0,
                 "bucket": 16} for _ in reqs]


@pytest.mark.smoke
def test_batcher_overload_sheds_with_retry_after():
    """Requests beyond max_queue raise ServerOverloaded immediately (no
    device time spent) while queued requests still complete."""
    from masg_tpu.infer.serving import DynamicBatcher, ServerOverloaded

    eng = _GatedEngine()
    batcher = DynamicBatcher(eng, max_batch=1, window_ms=1.0, max_queue=2)
    try:
        results = []
        threads = [threading.Thread(
            target=lambda: results.append(batcher.synthesize([5, 6, 7])))
            for _ in range(3)]
        threads[0].start()
        assert eng.inflight.wait(10)  # worker holds request 0 at the gate
        threads[1].start()
        threads[2].start()
        deadline = time.monotonic() + 10
        while len(batcher._queue) < 2:  # both waiters queued
            assert time.monotonic() < deadline
            time.sleep(0.005)
        with pytest.raises(ServerOverloaded) as exc:
            batcher.synthesize([5, 6, 7])
        assert exc.value.retry_after_s >= 1.0
        assert batcher.n_shed_overload == 1
        eng.gate.set()
        for t in threads:
            t.join(timeout=10)
        assert len(results) == 3  # queued requests all served after release
        assert eng.n_requests == 3  # the shed request never hit the device
    finally:
        eng.gate.set()
        batcher.close()


@pytest.mark.smoke
def test_batcher_request_timeout_sheds_queued():
    """Queued requests past their deadline raise RequestTimeout and are shed
    without device time; an IN-FLIGHT overrun that finishes inside the
    dispatch-scale grace returns its result (in-flight completion beats
    raising)."""
    from masg_tpu.infer.serving import DynamicBatcher, RequestTimeout

    eng = _GatedEngine()
    batcher = DynamicBatcher(eng, max_batch=1, window_ms=1.0,
                             request_timeout_s=0.2)
    try:
        errors = []

        def call():
            try:
                batcher.synthesize([5, 6, 7])
                errors.append(None)
            except Exception as e:
                errors.append(e)

        threads = [threading.Thread(target=call) for _ in range(3)]
        threads[0].start()
        assert eng.inflight.wait(10)  # request 0 held in flight at the gate
        threads[1].start()
        threads[2].start()
        time.sleep(0.5)  # all three deadlines expire while the gate holds
        eng.gate.set()  # ...but the in-flight one finishes inside its grace
        for t in threads:
            t.join(timeout=10)
        # in-flight request completed (device time was already spent);
        # the two queued ones were shed
        assert errors.count(None) == 1, errors
        assert sum(isinstance(e, RequestTimeout) for e in errors) == 2, errors
        deadline = time.monotonic() + 5
        while batcher.n_shed_timeout < 2 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert batcher.n_shed_timeout == 2
        assert eng.n_requests == 1
        assert batcher.n_timeout_inflight == 0
    finally:
        eng.gate.set()
        batcher.close()


@pytest.mark.smoke
def test_batcher_inflight_grace_expiry_counts_metric():
    """An in-flight request that outlives even the dispatch grace raises
    RequestTimeout and is counted in n_timeout_inflight (ADVICE r4)."""
    from masg_tpu.infer.serving import DynamicBatcher, RequestTimeout

    eng = _GatedEngine()
    batcher = DynamicBatcher(eng, max_batch=1, window_ms=1.0,
                             request_timeout_s=0.05)
    batcher._ema_s_per_req = 0.01  # grace = max(1.0, .01*1*2) = 1.0 s
    try:
        with pytest.raises(RequestTimeout, match="in-flight grace"):
            batcher.synthesize([5, 6, 7])  # gate never opens inside grace
        assert batcher.n_timeout_inflight == 1
    finally:
        eng.gate.set()
        batcher.close()


@pytest.mark.smoke
def test_batcher_expired_queue_entries_do_not_shed_new_requests():
    """Dead queue entries (callers already timed out) must not count toward
    max_queue: submit prunes them instead of 503ing live traffic (ADVICE
    r4)."""
    from masg_tpu.infer.serving import DynamicBatcher, RequestTimeout

    eng = _GatedEngine()
    batcher = DynamicBatcher(eng, max_batch=1, window_ms=1.0, max_queue=1,
                             request_timeout_s=0.05)
    try:
        errors = []

        def call():
            try:
                batcher.synthesize([5, 6, 7])
                errors.append(None)
            except Exception as e:
                errors.append(e)

        t0 = threading.Thread(target=call)
        t0.start()
        assert eng.inflight.wait(10)  # worker holds request 0 at the gate
        t1 = threading.Thread(target=call)
        t1.start()  # fills the queue (depth 1 = max_queue)
        time.sleep(0.3)  # request 1's deadline expires while queued
        # queue is nominally full of a DEAD entry; a live request must get
        # in (prune), not be shed with 503
        t2 = threading.Thread(target=call)
        t2.start()
        time.sleep(0.05)
        assert batcher.n_shed_overload == 0
        eng.gate.set()
        for t in (t0, t1, t2):
            t.join(timeout=10)
        assert batcher.n_shed_overload == 0
    finally:
        eng.gate.set()
        batcher.close()


@pytest.mark.smoke
def test_bypass_paths_shed_on_overload():
    """Streaming / chunked / speaker_emb requests bypass the batch queue but
    still shed with 503 once max_queue concurrent bypasses are in flight
    (ADVICE r4: overload protection must cover every path)."""
    from masg_tpu.infer.serving import DynamicBatcher, ServerOverloaded

    class _SlowBypassEngine(_GatedEngine):
        def synthesize(self, ids, **kw):
            self.inflight.set()
            assert self.gate.wait(10)
            return {"mel_len": 4}

        def synthesize_chunked(self, ids, **kw):
            return self.synthesize(ids)

        def synthesize_streaming(self, ids, **kw):
            self.inflight.set()
            assert self.gate.wait(10)
            yield np.zeros(16, np.int16)

    eng = _SlowBypassEngine()
    batcher = DynamicBatcher(eng, max_batch=1, window_ms=1.0, max_queue=1)
    try:
        t = threading.Thread(
            target=lambda: batcher.synthesize([5], speaker_emb=np.zeros((1, 4))))
        t.start()
        assert eng.inflight.wait(10)  # one bypass holds the cap
        with pytest.raises(ServerOverloaded):
            batcher.synthesize_chunked([5, 6])
        with pytest.raises(ServerOverloaded):
            next(batcher.synthesize_streaming([5, 6]))
        assert batcher.n_shed_overload == 2
        eng.gate.set()
        t.join(timeout=10)
        # capacity released: a new bypass goes through
        out = batcher.synthesize_chunked([5, 6])
        assert out["mel_len"] == 4
    finally:
        eng.gate.set()
        batcher.close()


@pytest.mark.smoke
def test_http_overload_maps_to_503():
    """A full batcher queue surfaces as HTTP 503 + Retry-After; /health
    reports queue depth and shed counters."""
    from masg_tpu.cli.serve import make_server
    from masg_tpu.infer.serving import DynamicBatcher

    eng = _GatedEngine()
    batcher = DynamicBatcher(eng, max_batch=1, window_ms=1.0, max_queue=1)
    srv = make_server(batcher, port=0)
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        codes = {}

        def post():
            req = urllib.request.Request(
                url + "/synthesize", data=json.dumps(
                    {"phones": "{a o i}"}).encode(),
                headers={"Content-Type": "application/json"}, method="POST")
            try:
                with urllib.request.urlopen(req, timeout=30) as resp:
                    codes[threading.get_ident()] = (resp.status, None)
            except urllib.error.HTTPError as e:
                codes[threading.get_ident()] = (
                    e.code, e.headers.get("Retry-After"))

        t0 = threading.Thread(target=post)
        t0.start()
        assert eng.inflight.wait(10)
        t1 = threading.Thread(target=post)
        t1.start()
        deadline = time.monotonic() + 10
        while len(batcher._queue) < 1:
            assert time.monotonic() < deadline
            time.sleep(0.005)
        post()  # queue full -> 503 on this caller
        eng.gate.set()
        t0.join(10)
        t1.join(10)
        got = sorted(codes.values())
        assert got[0][0] == 200 and got[1][0] == 200
        assert got[2][0] == 503 and int(got[2][1]) >= 1, got
        with urllib.request.urlopen(url + "/health", timeout=10) as resp:
            health = json.loads(resp.read())
        assert health["shed_overload"] == 1
        assert "queue_depth" in health
    finally:
        eng.gate.set()
        srv.shutdown()
        batcher.close()
