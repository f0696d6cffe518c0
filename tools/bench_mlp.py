"""Microbench: fused MLP trunk kernel vs flax modules on the live chip.

Production shapes: CanonicalMLP (127 -> 8x256 + skip at 5 -> 4) and
NonRigidMLP (111 -> 6x128 + skip at 4 -> 3) at 262144 samples, bf16.
"""

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import jax.numpy as jnp

from hosnerf_tpu.models.human_components import CanonicalMLP, NonRigidMLP
from hosnerf_tpu.ops.pallas import mlp as pmlp
from hosnerf_tpu.utils.benchtools import force_value

N = 262144
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
    print(f"{name:34s} {(time.perf_counter() - t0) / ITERS * 1e3:9.2f} ms",
          flush=True)


def bench_arch(name, din, width, depth, skip_before, skip_order,
               skip_off, skip_w, dout, flax_mod, flax_args):
    rng = jax.random.key(0)
    dims = []
    prev = din
    for i in range(depth):
        d_in = prev + (skip_w if i == skip_before else 0)
        dims.append((d_in, width))
        prev = width
    ws = []
    for (di, do) in dims:
        rng, k1, k2 = jax.random.split(rng, 3)
        ws.append((jax.random.normal(k1, (di, do)) / jnp.sqrt(1.0 * di),
                   jnp.zeros((do,))))
    rng, k1 = jax.random.split(rng)
    wout = (jax.random.normal(k1, (width, dout)) * 0.05, jnp.zeros((dout,)))
    x = jax.random.normal(jax.random.key(9), (N, din))

    kw = dict(skip_before=skip_before, skip_order=skip_order,
              skip_off=skip_off, skip_width=skip_w, precision="bf16")

    def loss_k(x_, ws_, wout_, prev, k):
        x_ = x_ + 1e-6 * jax.random.uniform(k, (1,))
        return jnp.sum(pmlp.fused_trunk(x_, ws_, wout_, **kw) ** 2) + 0.0 * prev

    gk = jax.jit(jax.grad(loss_k, argnums=(1, 2)))

    @jax.jit
    def run_k(prev, k):
        g = gk(x, ws, wout, prev, k)
        return jax.tree.leaves(g)[0].ravel()[0]

    chain(f"{name} fused fwd+bwd", run_k)

    # flax reference
    params = flax_mod.init(jax.random.key(0), *flax_args(x))["params"]

    def loss_f(p, x_, prev, k):
        x_ = x_ + 1e-6 * jax.random.uniform(k, (1,))
        out = flax_mod.apply({"params": p}, *flax_args(x_))
        leaf = out["xyz"] if isinstance(out, dict) else out
        return jnp.sum(leaf ** 2) + 0.0 * prev

    gf = jax.jit(jax.grad(loss_f, argnums=(0,)))

    @jax.jit
    def run_f(prev, k):
        g = gf(params, x, prev, k)
        return jax.tree.leaves(g)[0].ravel()[0]

    chain(f"{name} flax  fwd+bwd", run_f)


def main():
    cnl = CanonicalMLP(mlp_depth=8, mlp_width=256,
                       compute_dtype=jnp.bfloat16)
    bench_arch("cnl", 127, 256, 8, 5, "input_first", 0, 127, 4,
               cnl, lambda x: (x,))
    nr = NonRigidMLP(mlp_depth=6, mlp_width=128, skips=(4,),
                     compute_dtype=jnp.bfloat16)
    bench_arch("nr ", 111, 128, 6, 4, "h_first", 75, 36, 3,
               nr, lambda x: (x[:, 75:], x[:, :3], x[:, :75]))


if __name__ == "__main__":
    main()
