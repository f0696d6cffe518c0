"""Device mesh + sharding helpers.

The reference's only parallelism is DDP over 4 GPUs with rank-strided batch
sharding (ref: 1st_State-Conditional_Scene/run.py:139-156,
src/data/sampler.py). The TPU-native analog is a 1-D `data` mesh: the ray
axis of every batch is sharded across devices, params are replicated, and
XLA inserts the psum for gradients inside the jitted train step — no NCCL
plumbing, no custom samplers.

Eval keeps the reference's dummy-ray padding trick (pad ray counts to a
multiple of the mesh size, src/data/interface.py:152-166) via
`pad_to_multiple`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray/batch) axis across the data mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Device-put a host batch with the leading axis sharded; scalars and
    rank-0 arrays are replicated."""
    data = data_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] % mesh.size != 0:
            return jax.device_put(x, rep)
        return jax.device_put(x, data)

    return jax.tree.map(put, batch)


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad axis 0 with repeats of the first element to a multiple of
    `multiple`; returns (padded, original_length)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = np.repeat(np.take(x, [0], axis=axis), rem, axis=axis)
    return np.concatenate([x, pad], axis=axis), n


def shard_eval_fn(fn, mesh: Mesh):
    """Wrap an eval callable `fn(params, batch) -> array` so every call
    shards the batch's ray-leading arrays over the data mesh (the rest
    replicated) — the TPU-native analog of the reference's DDP eval
    (rank-strided eval rays + all_gather reassembly,
    ref: 1st.../src/model/interface.py:30-39, src/data/sampler.py:39-50).
    XLA splits the per-ray compute across devices and gathers the output;
    the host sees one full-chunk array as before. 1-device mesh: returned
    unchanged (no host round-trips added)."""
    if mesh.size == 1:
        return fn
    rep = replicated(mesh)

    def wrapped(params, batch):
        return fn(jax.device_put(params, rep), shard_batch(batch, mesh))

    return wrapped
