"""Microbench: the motion-weight volume decoder's transposed convs as
phase-decomposed matmuls (the shipped ConvTranspose3dTorch) vs XLA's
native lhs-dilated conv on TPU.

The phase form exists because XLA *CPU* executes lhs-dilated 3D convs
with a naive loop (18.6 s backward at decoder sizes). On TPU the
lhs-dilated conv lowers to MXU convolutions; this measures whether the
phase decomposition's 64x slab HBM traffic (8 phases x 8 shifted views
per layer + their pad-chain adjoints) costs more than it saves.

Usage: python tools/bench_deconv.py
"""

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from hosnerf_tpu.models.human_components import MotionWeightVolumeDecoder
from hosnerf_tpu.utils.benchtools import force_value

ITERS = 20
WARMUP = 3
KEYS = [jax.random.fold_in(jax.random.key(7), i) for i in range(64)]


def chain_time(name, grad_fn, base_args):
    prev = jnp.float32(0.0)

    def run(i, prev):
        g = grad_fn(prev, KEYS[i], *base_args)
        return jax.tree.leaves(g)[0].ravel()[0]

    for i in range(WARMUP):
        prev = run(i, prev)
    force_value(prev)
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + ITERS):
        prev = run(i, prev)
    force_value(prev)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    rng = jax.random.key(0)
    priors = jnp.asarray(np.random.default_rng(0).uniform(
        0.01, 1.0, (27, 32, 32, 32)).astype(np.float32))

    for impl in ("phase", "conv"):
        os.environ["HOSNERF_DECONV_IMPL"] = impl
        dec = MotionWeightVolumeDecoder(
            embedding_size=256, volume_size=32, total_bones=26,
            compute_dtype=jnp.bfloat16)
        dp = dec.init(rng, priors)["params"]

        def dec_loss(prev, rngk, p):
            pr = priors + 1e-6 * jax.random.uniform(rngk, (1,))
            return jnp.mean(dec.apply({"params": p}, pr)) + 0.0 * prev

        gd = jax.jit(jax.grad(dec_loss, argnums=(2,)))
        chain_time(f"vol_decoder fwd+bwd [{impl}]", gd, (dp,))


if __name__ == "__main__":
    main()
