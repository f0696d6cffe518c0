"""Time the stage-3 step's tail pieces: full loss fwd+bwd WITHOUT the
optimizer, and the optimizer update alone — to localize the residual
between the model fwd+bwd and the full train step.

Usage: python tools/profile_tail.py [n_patches]
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

from hosnerf_tpu.data import synthetic
from hosnerf_tpu.models.state import state_index
from hosnerf_tpu.train import stage3
from hosnerf_tpu.utils.benchtools import force_value

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


def main():
    n_patches = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    remat = os.environ.get("HOSNERF_REMAT",
                           "heavy" if n_patches >= 8 else "none")
    remat = remat if remat in ("none", "heavy", "all") else bool(int(remat))
    print(f"n_patches={n_patches} remat={remat}", flush=True)
    cfg = stage3.Stage3Config(n_patches=n_patches, compute_dtype="bf16",
                              remat=remat)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.composed_batch(n_patches, 32, grid_size=32).items()}
    params, opt_state, scene_model, human_model, opt = stage3.init_state(
        cfg, jax.random.key(0), batch)
    loss_fn = stage3.make_loss_fn(cfg, scene_model, human_model, None)

    vg = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def fwd_bwd_impl(ps, b, prev, rng):
        (loss, _), grads = vg(ps, None, b,
                              jnp.float32(100.0) + 0.0 * prev,
                              jnp.int32(0), rng)
        probe = sum(jnp.sum(leaf) for leaf in jax.tree.leaves(grads))
        return loss + 0.0 * probe

    chain("loss fwd+bwd (no optimizer)",
          lambda prev, rng: fwd_bwd_impl(params, batch, prev, rng))

    # optimizer alone: grads = params-shaped constants varied per call
    @jax.jit
    def opt_only_impl(ps, os_, prev, rng):
        eps = jax.random.uniform(rng, ()) * 1e-8
        grads = jax.tree.map(lambda p: p * 1e-6 + eps + 0.0 * prev, ps)
        updates, new_state = opt.update(grads, os_, ps)
        new_p = jax.tree.map(lambda a, b: a + b, ps, updates)
        probe = sum(jnp.sum(l) for l in jax.tree.leaves(new_p))
        return probe

    chain("optimizer update alone",
          lambda prev, rng: opt_only_impl(params, opt_state, prev, rng))

    # forward only (no grad) for reference
    @jax.jit
    def fwd_only_impl(ps, b, prev, rng):
        loss, _ = loss_fn(ps, None, b,
                          jnp.float32(100.0) + 0.0 * prev, jnp.int32(0),
                          rng)
        return loss

    chain("loss forward only",
          lambda prev, rng: fwd_only_impl(params, batch, prev, rng))


if __name__ == "__main__":
    main()
