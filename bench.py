"""Benchmark: STAGE-3 training throughput (rays/sec/chip) on real hardware
— the BASELINE.json headline metric ("rays/sec/chip in stage-3 training").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Run config: production model sizes (3-level scene stack 64/64/32 samples,
8x1024 NeRF MLP; human 128 samples/ray, 8x256 canonical MLP, full LBS +
non-rigid + cycle + flow branches, joint Adam with per-group LRs), at
8 patches x 32^2 = 8192 rays/step — 4x the reference's GLOBAL batch
(2 patches/rank x 4 ranks; ref 3rd_Complete_HOSNeRF/configs/default.yaml:
142-147).

The reference never measured throughput (BASELINE.md). `vs_baseline`
divides by a documented generous estimate of the torch stage-3 step:
REF_RAYS_PER_SEC_PER_GPU below (2048 rays in ~0.2 s/step on an A100-class
GPU). The BASELINE.json north star is >=5x reference-GPU rays/sec/chip.
"""

import json
import time

import jax
import jax.numpy as jnp

from hosnerf_tpu.data import synthetic
from hosnerf_tpu.train import stage3

REF_RAYS_PER_SEC_PER_GPU = 10_000.0

N_PATCHES = 8
RAYS = N_PATCHES * 32 * 32
WARMUP = 3
ITERS = 20


def main():
    cfg = stage3.Stage3Config(n_patches=N_PATCHES)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.composed_batch(N_PATCHES, 32, grid_size=32).items()}
    params, opt_state, scene_model, human_model, opt = stage3.init_state(
        cfg, jax.random.key(0), batch)
    step = jax.jit(stage3.make_train_step(cfg, scene_model, human_model,
                                          opt), donate_argnums=(0, 1))
    rng = jax.random.key(1)
    for i in range(WARMUP):
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step(params, opt_state, None, batch,
                                      jnp.float32(i), sub)
    jax.block_until_ready(aux["loss"])

    t0 = time.perf_counter()
    for i in range(ITERS):
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step(params, opt_state, None, batch,
                                      jnp.float32(WARMUP + i), sub)
    jax.block_until_ready(aux["loss"])
    dt = time.perf_counter() - t0

    n_chips = len(jax.devices())
    rays_per_sec_per_chip = RAYS * ITERS / dt / n_chips
    print(json.dumps({
        "metric": "stage3_train_rays_per_sec_per_chip",
        "value": round(float(rays_per_sec_per_chip), 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(
            float(rays_per_sec_per_chip / REF_RAYS_PER_SEC_PER_GPU), 3),
    }))


if __name__ == "__main__":
    main()
