"""Multi-host (DCN) initialization.

The reference's distributed story is single-host NCCL DDP (SURVEY.md §2.6).
The TPU-native analog for pods: `jax.distributed.initialize` connects the
per-host JAX processes over DCN, after which `jax.devices()` spans the pod
and the same 1-D data mesh in parallel/mesh.py scales across hosts — the
jitted train step is unchanged (XLA routes the gradient psum over ICI
within a slice and DCN across slices).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. No-ops on single-process setups.

    On Cloud TPU pods the arguments are auto-detected from the metadata
    server; elsewhere pass them (or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    """
    import jax

    env = os.environ
    coordinator_address = coordinator_address or env.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in env:
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in env:
        process_id = int(env["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def is_primary() -> bool:
    import jax
    return jax.process_index() == 0
