"""Microbench: inverse/shared Pallas LBS kernels on the live chip.

Times forward-only and fwd+bwd at production sizes with the fetch-forced
chained protocol. Usage: python tools/bench_lbs.py [n_samples]
"""

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from hosnerf_tpu.ops import lbs as lbs_ops
from hosnerf_tpu.utils.benchtools import force_value

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
ITERS = 10
WARMUP = 2
KEYS = [jax.random.fold_in(jax.random.key(7), i) for i in range(64)]


def chain(name, fn):
    st = {"prev": jnp.float32(0.0)}
    for i in range(WARMUP):
        st["prev"] = fn(st["prev"], KEYS[i])
    force_value(st["prev"])
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + ITERS):
        st["prev"] = fn(st["prev"], KEYS[i])
    force_value(st["prev"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:30s} {dt * 1e3:9.2f} ms", flush=True)


def main():
    rng = jax.random.key(0)
    pts = jax.random.normal(rng, (N, 3)) * 0.5
    B, G = 26, 32
    m_sR = jax.random.normal(rng, (B, 3, 3)) * 0.1 + jnp.eye(3)
    m_T = jax.random.normal(rng, (B, 3)) * 0.1
    vol = jax.nn.softmax(jax.random.normal(rng, (B + 1, G, G, G)), axis=0)
    bmin = jnp.array([-1.0, -1.0, -1.0])
    bscale = jnp.array([1.0, 1.0, 1.0])
    print(f"n_samples={N}", flush=True)

    @jax.jit
    def inv_fwd(prev, k, p=pts):
        p = p + 1e-6 * jax.random.uniform(k, (1,))
        x, m = lbs_ops.inverse_warp(p, m_sR, m_T, vol, bmin, bscale,
                                    impl="pallas")
        return jnp.mean(x) + jnp.mean(m) + 0.0 * prev

    chain("inverse fwd", inv_fwd)

    def inv_loss(p, vol_, prev, k):
        p = p + 1e-6 * jax.random.uniform(k, (1,))
        x, m = lbs_ops.inverse_warp(p, m_sR, m_T, vol_, bmin, bscale,
                                    impl="pallas")
        return jnp.mean(x) + jnp.mean(m) + 0.0 * prev

    ginv = jax.jit(jax.grad(inv_loss, argnums=(1,)))

    @jax.jit
    def inv_fb(prev, k):
        g = ginv(pts, vol, prev, k)
        return jax.tree.leaves(g)[0].ravel()[0]

    chain("inverse fwd+bwd", inv_fb)

    @jax.jit
    def sh_fwd(prev, k, p=pts):
        p = p + 1e-6 * jax.random.uniform(k, (1,))
        w = lbs_ops.bone_weights(p, vol, bmin, bscale, impl="pallas")
        return jnp.mean(w) + 0.0 * prev

    chain("shared fwd", sh_fwd)

    def sh_loss(p, vol_, prev, k):
        p = p + 1e-6 * jax.random.uniform(k, (1,))
        w = lbs_ops.bone_weights(p, vol_, bmin, bscale, impl="pallas")
        d, _ = lbs_ops.apply_forward_lbs(w, p, m_sR, m_T)
        return jnp.mean(d) + 0.0 * prev

    gsh = jax.jit(jax.grad(sh_loss, argnums=(0, 1)))

    @jax.jit
    def sh_fb(prev, k):
        g = gsh(pts, vol, prev, k)
        return jax.tree.leaves(g)[0].ravel()[0]

    chain("shared+fwd_lbs fwd+bwd", sh_fb)


if __name__ == "__main__":
    main()
