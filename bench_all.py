"""Exploratory benchmark: per-stage training-step throughput on real
hardware at the reference's production sizes. (bench.py stays the driver's
single-line contract; this prints a table.)

Reference sizes: stage 1 = 4096 rays x (64+64+32) samples; stages 2/3 =
2 patches x 32^2 = 2048 rays x 128 samples (+32 bkg samples in stage 3).
"""

import json
import os
import time

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from hosnerf_tpu.utils.benchtools import timeit_chain


def bench_stage1():
    from hosnerf_tpu.data import synthetic
    from hosnerf_tpu.train import stage1
    cfg = stage1.Stage1Config(max_steps=500_000, near=0.5, far=1e6)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.scene_ray_batch(4096).items()}
    params, opt_state, model = stage1.init_state(cfg, jax.random.key(0),
                                                 batch)
    opt = stage1.make_optimizer(cfg)
    step = jax.jit(stage1.make_train_step(cfg, model, opt))
    args = [(params, opt_state, batch, jnp.int32(1000 + i),
             jax.random.fold_in(jax.random.key(1), i)) for i in range(12)]
    dt = timeit_chain(step, args, iters=10)
    return {"stage": 1, "rays": 4096, "sec_per_step": dt,
            "rays_per_sec": 4096 / dt}


def bench_stage2():
    from hosnerf_tpu.data import synthetic
    from hosnerf_tpu.train import stage2
    cfg = stage2.Stage2Config()  # production sizes
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.human_batch(2, 32, grid_size=32).items()}
    params, opt_state, model, opt = stage2.init_state(
        cfg, jax.random.key(0), batch)
    step = jax.jit(stage2.make_train_step(cfg, model, opt))
    args = [(params, opt_state, None, batch, jnp.float32(1000 + i),
             jax.random.fold_in(jax.random.key(1), i)) for i in range(12)]
    dt = timeit_chain(step, args, iters=10)
    rays = 2 * 32 * 32
    return {"stage": 2, "rays": rays, "sec_per_step": dt,
            "rays_per_sec": rays / dt}


def bench_stage3():
    from hosnerf_tpu.data import synthetic
    from hosnerf_tpu.train import stage3
    cfg = stage3.Stage3Config()  # production sizes
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.composed_batch(2, 32, grid_size=32).items()}
    params, opt_state, scene_model, human_model, opt = stage3.init_state(
        cfg, jax.random.key(0), batch)
    step = jax.jit(stage3.make_train_step(cfg, scene_model, human_model,
                                          opt))
    args = [(params, opt_state, None, batch, jnp.float32(1000 + i),
             jax.random.fold_in(jax.random.key(1), i)) for i in range(12)]
    dt = timeit_chain(step, args, iters=10)
    rays = 2 * 32 * 32
    return {"stage": 3, "rays": rays, "sec_per_step": dt,
            "rays_per_sec": rays / dt}


if __name__ == "__main__":
    import sys
    which = sys.argv[1:] or ["1", "2", "3"]
    for w in which:
        fn = {"1": bench_stage1, "2": bench_stage2, "3": bench_stage3}[w]
        t0 = time.perf_counter()
        res = fn()
        res["total_incl_compile"] = time.perf_counter() - t0
        print(json.dumps(res), flush=True)
