"""Benchmark: stage-1 training throughput (rays/sec/chip) on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference never measured or logged throughput (BASELINE.md: only a TQDM
bar), so `vs_baseline` is computed against a documented estimate of the
torch reference's stage-1 hot loop: REF_RAYS_PER_SEC_PER_GPU below. The
BASELINE.json north star is >=5x reference-GPU rays/sec/chip.

Run config matches the reference's stage-1 training step: 4096 rays/step,
3 levels x (64, 64, 32) samples, PropMLP 4x256 (x2) + NeRFMLP 8x1024
(ref: 1st_State-Conditional_Scene/configs/state_mipnerf360/Backpack.gin:9,13,
src/model/mipnerf360/model.py:296-298).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hosnerf_tpu.data import synthetic
from hosnerf_tpu.train import stage1

# Estimated reference throughput of the torch stage-1 training step on one
# A100-class GPU (4096 rays global / 4 GPUs at ~1 step/s level; generous).
REF_RAYS_PER_SEC_PER_GPU = 20_000.0

BATCH = 4096
WARMUP = 3
ITERS = 20


def main():
    cfg = stage1.Stage1Config(max_steps=500_000, near=0.5, far=1e6)
    host_batch = synthetic.scene_ray_batch(BATCH)
    batch = {k: jnp.asarray(v) for k, v in host_batch.items()}

    params, opt_state, model = stage1.init_state(
        cfg, jax.random.key(0), batch)
    opt = stage1.make_optimizer(cfg)
    step_fn = jax.jit(stage1.make_train_step(cfg, model, opt),
                      donate_argnums=(0, 1))

    rng = jax.random.key(1)
    for i in range(WARMUP):
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step_fn(params, opt_state, batch,
                                         jnp.float32(i), sub)
    jax.block_until_ready(aux["loss"])

    t0 = time.perf_counter()
    for i in range(ITERS):
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step_fn(params, opt_state, batch,
                                         jnp.float32(WARMUP + i), sub)
    jax.block_until_ready(aux["loss"])
    dt = time.perf_counter() - t0

    n_chips = len(jax.devices())
    rays_per_sec_per_chip = BATCH * ITERS / dt / n_chips
    print(json.dumps({
        "metric": "stage1_train_rays_per_sec_per_chip",
        "value": round(float(rays_per_sec_per_chip), 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(
            float(rays_per_sec_per_chip / REF_RAYS_PER_SEC_PER_GPU), 3),
    }))


if __name__ == "__main__":
    main()
