"""Data-parallel serving over the device mesh.

The reference's inference is one-shot single-device CLI scripts
(synthesize.py:104-131); the serving engine already fuses text->wav into one
jitted dispatch per bucket. On a multi-chip slice the idiomatic TPU scale-out
is GSPMD: replicate params over the mesh, shard the request batch on the
'data' axis, and let XLA partition the whole fused graph — no per-chip
processes, no collection/scatter code. These tests pin the correctness
contract on the 8-device virtual CPU mesh: a mesh engine must produce the
same audio as a single-device engine, for sharded batches (B % n_data == 0),
non-divisible batches (falls back to replicated compute), and the B=1
latency path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_fastspeech2 import tiny_config
from test_serving import _biased_variables


@pytest.fixture(scope="module")
def engines():
    """(single-device engine, mesh engine) sharing identical weights."""
    from masg_tpu.infer.serving import ServingEngine
    from masg_tpu.infer.vocoder import Vocoder
    from masg_tpu.models import FastSpeech2
    from masg_tpu.models.hifigan import HiFiGANGenerator
    from masg_tpu.parallel.mesh import make_mesh

    cfg = tiny_config()
    model = FastSpeech2.from_config(cfg)
    variables = _biased_variables(model, cfg)

    gen = HiFiGANGenerator(upsample_initial_channel=32)
    voc_params = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 80)))["params"]

    def build(mesh):
        return ServingEngine(
            cfg, variables=variables, vocoder=Vocoder(gen, voc_params),
            text_buckets=(16,), frames_per_phone=8, mesh=mesh,
        )

    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
    assert mesh.shape["data"] == 8, "conftest forces an 8-device CPU mesh"
    return build(None), build(mesh)


def _requests(n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "ids": list(rng.integers(5, 40, size=int(rng.integers(4, 15)))),
            "speaker_id": int(rng.integers(0, 2)),
            "duration_control": float(rng.uniform(0.8, 1.2)),
        }
        for _ in range(n)
    ]


def test_mesh_batch_matches_single_device(engines):
    single, dp = engines
    reqs = _requests(8)
    r_single = single.synthesize_many(reqs, batch_buckets=(8,))
    r_dp = dp.synthesize_many(reqs, batch_buckets=(8,))
    for a, b in zip(r_single, r_dp):
        assert a["mel_len"] == b["mel_len"]
        np.testing.assert_allclose(
            a["wav"].astype(np.float32), b["wav"].astype(np.float32), atol=1.5)


def test_mesh_batch_is_actually_sharded(engines):
    """The dispatched arrays must carry a 'data'-sharded layout — otherwise
    the test above would pass on silently replicated compute."""
    _, dp = engines
    placed = dp._place_dp(np.ones((8, 16), np.int32))[0]
    shards = {s.device for s in placed.addressable_shards}
    assert len(shards) == 8
    assert placed.sharding.spec == jax.sharding.PartitionSpec("data")


def test_mesh_non_divisible_batch_replicates(engines):
    """B=1 and B not divisible by n_data fall back to replicated placement
    (same graph, every device computes the full batch) — correctness over
    partial speedup for the latency path."""
    single, dp = engines
    ids = list(range(5, 14))
    r1 = single.synthesize(ids, duration_control=1.1)
    r2 = dp.synthesize(ids, duration_control=1.1)
    assert r1["mel_len"] == r2["mel_len"]
    np.testing.assert_allclose(
        r1["wav"].astype(np.float32), r2["wav"].astype(np.float32), atol=1.5)

    placed = dp._place_dp(np.ones((3, 16), np.int32))[0]  # 3 % 8 != 0
    assert placed.sharding.spec == jax.sharding.PartitionSpec()


def test_mesh_dynamic_batcher(engines):
    """The batcher composes with the mesh engine unchanged: concurrent
    requests fuse into one sharded dispatch."""
    import threading

    from masg_tpu.infer.serving import DynamicBatcher

    single, dp = engines
    batcher = DynamicBatcher(dp, max_batch=8, window_ms=30.0)
    try:
        reqs = _requests(8, seed=1)
        results = [None] * len(reqs)

        def worker(i):
            r = dict(reqs[i])
            results[i] = batcher.synthesize(r.pop("ids"), **r)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        batcher.close()

    expected = single.synthesize_many(_requests(8, seed=1), batch_buckets=(8,))
    for got, want in zip(results, expected):
        assert got["mel_len"] == want["mel_len"]
        np.testing.assert_allclose(
            got["wav"].astype(np.float32), want["wav"].astype(np.float32),
            atol=1.5)
