"""Run the Pallas flash-attention kernel on the REAL TPU backend (not
interpret mode) and assert it matches the XLA attention path.

Invoked by tests/test_flash_tpu.py in a subprocess so the test-suite-wide
CPU pin (tests/conftest.py) doesn't apply. Exit code 0 = pass.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from masg_tpu.ops.attention import flash_attention, mha_attention

    platform = jax.devices()[0].platform
    assert platform == "tpu", f"expected a real TPU backend, got {platform}"

    rng = np.random.default_rng(0)
    for (b, h, t, dh) in [(2, 2, 128, 64), (2, 2, 1000, 128), (4, 8, 512, 64)]:
        q = jnp.asarray(rng.normal(size=(b, h, t, dh)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, h, t, dh)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, h, t, dh)), jnp.float32)
        lens = jnp.asarray(rng.integers(1, t + 1, size=(b,)), jnp.int32)
        pad = jnp.arange(t)[None, :] >= lens[:, None]
        o1 = np.asarray(jax.jit(flash_attention)(q, k, v, lens))
        o2 = np.asarray(jax.jit(mha_attention)(q, k, v, pad))
        valid = np.asarray(~pad)[:, None, :, None] & np.ones((1, h, 1, dh), bool)
        diff = np.abs(o1 - o2)[valid].max()
        # TPU f32 matmuls run as bf16 passes -> ~1e-3-level differences
        assert diff < 2e-2, (b, h, t, dh, diff)
        print(f"flash==xla on tpu ok {(b, h, t, dh)} max|diff|={diff:.2e}")
    print("OK")


if __name__ == "__main__":
    main()
