"""Benchmark: STAGE-3 training throughput (rays/sec/chip) on real hardware
— the BASELINE.json headline metric ("rays/sec/chip in stage-3 training").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Run config: production model sizes (3-level scene stack 64/64/32 samples,
8x1024 NeRF MLP; human 128 samples/ray, 8x256 canonical MLP, full LBS +
non-rigid + cycle + flow branches, joint Adam with per-group LRs), at the
reference's per-rank batch: 2 patches x 32^2 = 2048 rays/step
(ref 3rd_Complete_HOSNeRF/configs/default.yaml:142-147). Larger batches
scale further (8 patches measured 1.1-1.8M rays/s/chip) but are less
robust through the tunneled dev chip; see git history.

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

N_PATCHES = 2  # the reference production batch per rank
RAYS = N_PATCHES * 32 * 32
WARMUP = 5
ITERS = 30
# NOTE: steps are dispatched one-by-one from a 1-core host through the
# axon tunnel, so this UNDERSTATES device throughput when step time drops
# below dispatch latency (a lax.scan-fused variant measured up to ~1.8M
# rays/s/chip but intermittently faulted the tunneled device; keeping the
# robust form for the unattended driver run).


def main():
    cfg = stage3.Stage3Config(n_patches=N_PATCHES)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.composed_batch(N_PATCHES, 32, grid_size=32).items()}
    params, opt_state, scene_model, human_model, opt = stage3.init_state(
        cfg, jax.random.key(0), batch)
    step = jax.jit(stage3.make_train_step(cfg, scene_model, human_model,
                                          opt))
    # NOTE: steps are timed with a FIXED carry (params not threaded through
    # the loop): each call still runs the complete fwd+bwd+optimizer
    # program, but dependent-carry chains through the axon tunnel
    # intermittently fall off the device-residency fast path (~9 s/step of
    # host<->device param traffic), which would measure the tunnel, not
    # the chip.
    rng = jax.random.key(1)
    step0 = jnp.float32(100.0)
    for _ in range(WARMUP):
        out = step(params, opt_state, None, batch, step0, rng)
        jax.block_until_ready(out[2]["loss"])  # see note below: never queue

    # block every step: queueing many in-flight executions through the
    # tunnel intermittently degrades to seconds/step (buffer-deletion
    # backpressure); per-step sync adds ~1-2 ms but is stable
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(params, opt_state, None, batch, step0, rng)
        jax.block_until_ready(out[2]["loss"])
    dt = time.perf_counter() - t0

    # loss check AFTER timing: running ANY other program (even a tiny
    # jnp.isfinite) between executions knocks the tunneled device off its
    # loaded-program fast path — every later step then costs a constant
    # ~2.3 s reload. Observed and bisected on this axon setup.
    assert bool(jnp.isfinite(out[2]["loss"])), "non-finite training loss"

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
