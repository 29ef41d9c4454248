"""Multi-host initialization (DCN).

The reference's only multi-process path is NCCL DDP in the GE2E trainer
(train_speech_embedder.py:128-132). The TPU-native equivalent: call
`initialize()` once per host before any jax use; jax.distributed wires the
hosts over DCN and `jax.devices()` then spans the full slice, so the same
(data, model) mesh from parallel/mesh.py scales out with no further changes —
XLA routes intra-slice collectives over ICI and cross-slice over DCN.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env fallbacks
    (MASG_COORDINATOR / MASG_NUM_PROCESSES / MASG_PROCESS_ID).

    On single-host TPU or managed TPU pods (where jax auto-detects the
    topology) calling with no args is correct and cheap.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("MASG_COORDINATOR")
    if num_processes is None and "MASG_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["MASG_NUM_PROCESSES"])
    if process_id is None and "MASG_PROCESS_ID" in os.environ:
        process_id = int(os.environ["MASG_PROCESS_ID"])

    kwargs = {}
    if coordinator_address:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        # rendezvous window; MASG_INIT_TIMEOUT widens it on loaded hosts
        # (CI runs the two-process test concurrently with the main suite)
        if os.environ.get("MASG_INIT_TIMEOUT"):
            kwargs["initialization_timeout"] = int(
                os.environ["MASG_INIT_TIMEOUT"])
    try:
        # CPU backends need an explicit cross-process collectives impl
        # (no-op for TPU, where collectives ride ICI/DCN natively)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        # single-process runs (the common dev case) are not an error
        if "already" not in str(e).lower():
            import warnings

            warnings.warn(f"jax.distributed.initialize skipped: {e}")
