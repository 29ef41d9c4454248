"""Serving dynamic-batch sweep: find the throughput knee, report latency
percentiles through the tunnel (VERDICT r2 item 8).

Builds the full-size FastSpeech2 + HiFi-GAN engine (bf16, duration bias
ln(5) so a fresh model free-runs ~4 frames/phone — bench.py's trick), then
for each --dynamic_batch value fires N mixed-length requests from C
concurrent client threads through a DynamicBatcher and reports req/s and
p50/p90/p99 per-request latency.

    python scripts/bench_serving.py [--requests 128] [--concurrency 64] \
        [--batches 1,8,16,32]
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math

import numpy as np


def run_sweep(max_batch, n_requests, concurrency, engine_kwargs,
              max_queue=None, request_timeout_s=None):
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from masg_tpu.infer.serving import (DynamicBatcher, ServingEngine,
                                        with_duration_bias)
    from masg_tpu.infer.vocoder import get_vocoder
    from masg_tpu.models import FastSpeech2

    cfg = _flagship()
    vocoder = get_vocoder(cfg.model, None)

    import jax

    model = FastSpeech2.from_config(cfg)
    L = 16
    init_fn = jax.jit(lambda r: model.init(
        r, jnp.zeros(1, jnp.int32), jnp.ones((1, L), jnp.int32),
        jnp.asarray([L], jnp.int32), 64,
        accents=jnp.zeros((1, L), jnp.int32),
        speaker_meta=jnp.zeros((1, 4))))
    variables = with_duration_bias(init_fn(jax.random.PRNGKey(0)),
                                   math.log(5.0))

    engine = ServingEngine(cfg, variables=variables, vocoder=vocoder,
                           dtype=jnp.bfloat16, **engine_kwargs)
    batcher = None
    target = engine
    ladder = (1,)
    if max_batch > 1:
        batcher = DynamicBatcher(engine, max_batch=max_batch, window_ms=5.0,
                                 max_queue=max_queue,
                                 request_timeout_s=request_timeout_s)
        ladder = tuple(batcher._buckets)
        target = batcher

    t0 = time.time()
    warm = engine.warmup(batch_sizes=ladder)
    warm_s = time.time() - t0

    # mixed-length requests: short/medium/long phone sequences
    rng = np.random.default_rng(0)
    lengths = rng.choice([8, 14, 24, 40, 56, 90, 120],
                         p=[.2, .2, .2, .15, .15, .05, .05], size=n_requests)
    reqs = [list(rng.integers(1, 100, size=int(n))) for n in lengths]

    latencies = []
    lat_lock = threading.Lock()
    idx_iter = iter(range(n_requests))
    idx_lock = threading.Lock()

    shed = [0]

    def worker():
        from masg_tpu.infer.serving import RequestTimeout, ServerOverloaded

        while True:
            with idx_lock:
                i = next(idx_iter, None)
            if i is None:
                return
            t = time.perf_counter()
            try:
                out = target.synthesize(reqs[i], speaker_id=i % 16)
            except (ServerOverloaded, RequestTimeout):
                with lat_lock:
                    shed[0] += 1
                continue
            dt = time.perf_counter() - t
            assert out["mel_len"] > 0
            with lat_lock:
                latencies.append(dt)

    t0 = time.time()
    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    if batcher is not None:
        batcher.close()

    lat = np.sort(latencies)
    return {
        "max_batch": max_batch,
        "req_per_s": len(latencies) / wall,
        "shed": shed[0],
        "p50_ms": float(np.quantile(lat, 0.5) * 1e3),
        "p90_ms": float(np.quantile(lat, 0.9) * 1e3),
        "p99_ms": float(np.quantile(lat, 0.99) * 1e3),
        "warmup_s": warm_s,
        "graphs": len(warm),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=128)
    ap.add_argument("--concurrency", type=int, default=64)
    ap.add_argument("--batches", default="1,8,16,32")
    ap.add_argument("--max_queue", type=int, default=None,
                    help="enable overload shedding at this queue depth "
                         "(served req/s + shed count reported)")
    ap.add_argument("--request_timeout", type=float, default=None)
    args = ap.parse_args()

    from masg_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    for mb in (int(x) for x in args.batches.split(",")):
        r = run_sweep(mb, args.requests, args.concurrency, {},
                      max_queue=args.max_queue,
                      request_timeout_s=args.request_timeout)
        print(f"max_batch={r['max_batch']:3d}: {r['req_per_s']:7.1f} req/s  "
              f"shed={r['shed']:4d}  "
              f"p50={r['p50_ms']:7.1f} ms  p90={r['p90_ms']:7.1f} "
              f"p99={r['p99_ms']:7.1f}  (warmup {r['warmup_s']:.0f}s, "
              f"{r['graphs']} graphs)", flush=True)


if __name__ == "__main__":
    main()
