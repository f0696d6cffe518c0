"""Time ONLY the full stage-3 joint step at a given patch count / remat
split, with the fetch-forced chained protocol. Quick operating-point
sweeps without profile_step.py's component harnesses.

Usage:
  python tools/time_step.py [n_patches] [scene_remat:human_remat]
e.g.  python tools/time_step.py 8 none:heavy
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
from hosnerf_tpu.train import stage3
from hosnerf_tpu.utils.benchtools import force_value

N_PATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SPLIT = (sys.argv[2] if len(sys.argv) > 2 else "none:none").split(":")
ITERS = int(os.environ.get("ITERS", 8))
WARMUP = 2


def main():
    cfg = stage3.Stage3Config(
        n_patches=N_PATCHES, compute_dtype="bf16", remat="none",
        scene_remat=SPLIT[0], human_remat=SPLIT[1])
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.composed_batch(N_PATCHES, 32, grid_size=32).items()}
    params, opt_state, sm, hm, opt = stage3.init_state(
        cfg, jax.random.key(0), batch)
    raw = stage3.make_train_step(cfg, sm, hm, opt)

    def chained(ps, os_, b, prev_loss, iter_f, rng):
        it = iter_f + 0.0 * prev_loss
        new_p, _, losses = raw(ps, os_, None, b, it, rng)
        probe = sum(jnp.sum(leaf) for leaf in jax.tree.leaves(new_p))
        return losses["loss"] + 0.0 * probe

    step = jax.jit(chained)
    keys = [jax.random.fold_in(jax.random.key(3), i)
            for i in range(WARMUP + ITERS)]
    loss = jnp.float32(0.0)
    for i in range(WARMUP):
        loss = step(params, opt_state, batch, loss,
                    jnp.float32(100.0 + i), keys[i])
    force_value(loss)
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + ITERS):
        loss = step(params, opt_state, batch, loss,
                    jnp.float32(100.0 + i), keys[i])
    lv = force_value(loss)
    dt = (time.perf_counter() - t0) / ITERS
    rays = N_PATCHES * 32 * 32
    import math
    flag = "" if math.isfinite(lv) else "  ** NON-FINITE LOSS **"
    print(f"n_patches={N_PATCHES} split={SPLIT[0]}:{SPLIT[1]}  "
          f"{dt * 1e3:8.2f} ms/step  {rays / dt:9.1f} rays/s{flag}",
          flush=True)
    assert math.isfinite(lv), "non-finite training loss in timed chain"


if __name__ == "__main__":
    main()
