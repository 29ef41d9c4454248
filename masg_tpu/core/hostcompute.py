"""Pin offline feature extraction to the host CPU backend.

The reference's preprocessing layer is pure host CPU work
(/root/reference/preprocessor/preprocessor.py:169-265 — librosa/torchaudio on
CPU, no device boundary). In this framework the same math is expressed in
jnp; without a placement hint every eager op lands on the default accelerator
backend, which is wrong twice over: it burns accelerator time on offline
per-utterance feature extraction, and behind a remoted TPU (the axon tunnel)
every per-utterance host fetch pays the full round-trip (measured ~20 s per
fetch, turning a ~15 ms feature job into minutes).

`on_host()` scopes computation to the in-process CPU backend, which JAX keeps
available alongside any accelerator plugin.
"""

from __future__ import annotations

import contextlib


def host_device():
    """The first in-process CPU device, or None if unavailable."""
    import jax

    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


def on_host():
    """Context manager placing eager jnp ops on the host CPU backend."""
    import jax

    dev = host_device()
    if dev is None:
        return contextlib.nullcontext()
    return jax.default_device(dev)
