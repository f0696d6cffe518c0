"""Component-level timing of the stage-3 train step on the live chip.

Breaks the full-step time into: dispatch overhead (no-op chain), scene
fwd+bwd, human fwd+bwd, inverse-LBS fwd+bwd, and the full joint step —
each timed with the fetch-forced chained protocol (distinct inputs per
call, sequential on-device dependency, value fetch at the end; see
utils/benchtools.py for the relay pathologies that require this).

Also times a lax.scan over K inner steps in ONE dispatch (distinct rng
per inner step, params threaded through the scan) to separate per-
dispatch tunnel latency from device compute.

Usage: python tools/profile_step.py [n_patches]
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

N_PATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 2
# 'auto' (pair-grid pallas on TPU) | 'pallas_dense' | 'xla' | 'gather'
LBS_IMPL = os.environ.get("HOSNERF_LBS_IMPL", "auto")
# 'remat' (default True at >=8 patches) | env override 0/1
WARMUP = 2
ITERS = 10


def timed_chain(name, step, make_args, iters=ITERS, warmup=WARMUP):
    out = None
    for i in range(warmup):
        out = step(*make_args(i))
    force_value(out)
    t0 = time.perf_counter()
    for i in range(warmup, warmup + iters):
        out = step(*make_args(i))
    force_value(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt * 1e3:9.2f} ms/call", flush=True)
    return dt


def main():
    raw = os.environ.get("HOSNERF_REMAT", "1" if N_PATCHES >= 8 else "0")
    remat = raw if raw in ("none", "heavy", "all") else bool(int(raw))
    cfg = stage3.Stage3Config(n_patches=N_PATCHES, compute_dtype="bf16",
                              lbs_impl=LBS_IMPL, remat=remat)
    print(f"lbs_impl={LBS_IMPL} remat={remat}", flush=True)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.composed_batch(N_PATCHES, 32, grid_size=32).items()}
    params, opt_state, scene_model, human_model, opt = stage3.init_state(
        cfg, jax.random.key(0), batch)
    keys = [jax.random.fold_in(jax.random.key(1), i) for i in range(64)]
    jax.block_until_ready(keys[-1])
    print(f"n_patches={N_PATCHES} rays={N_PATCHES * 1024}", flush=True)

    # ---- dispatch overhead: chained scalar no-op ----
    @jax.jit
    def noop(x, k):
        return x + jax.random.uniform(k, ())

    x = jnp.float32(0.0)
    state = {"x": x}

    def noop_args(i):
        state["x"] = noop(state["x"], keys[i])
        return (state["x"], keys[i])
    # time it directly (chained through state)
    for i in range(WARMUP):
        state["x"] = noop(state["x"], keys[i])
    force_value(state["x"])
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + 20):
        state["x"] = noop(state["x"], keys[i])
    force_value(state["x"])
    print(f"{'dispatch noop':28s} {(time.perf_counter() - t0) / 20 * 1e3:9.2f}"
          " ms/call", flush=True)

    batch_bkg = {
        "rays_o": batch["rays_o_bkg"], "rays_d": batch["rays_d_bkg"],
        "viewdirs": batch["viewdirs_bkg"], "radii": batch["radii"],
    }

    # ---- scene fwd+bwd ----
    def scene_loss(p, prev, rng):
        _, hist = scene_model.apply({"params": p}, batch_bkg, 1.0, True,
                                    jnp.int32(0), cfg.near_bkg, cfg.far_bkg,
                                    rng=rng)
        h = hist[-1]
        return (jnp.mean(h["rgb"]) + jnp.mean(h["density"])
                + 0.0 * prev)

    scene_step = jax.jit(jax.grad(scene_loss))
    sg = {"g": None, "prev": jnp.float32(0.0)}

    def scene_args(i):
        a = (params["scene"], sg["prev"], keys[i])
        g = scene_step(*a)
        sg["prev"] = jax.tree.leaves(g)[0].ravel()[0]
        return a
    for i in range(WARMUP):
        scene_args(i)
    force_value(sg["prev"])
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + ITERS):
        scene_args(i)
    force_value(sg["prev"])
    print(f"{'scene fwd+bwd':28s} "
          f"{(time.perf_counter() - t0) / ITERS * 1e3:9.2f} ms/call",
          flush=True)

    # ---- human fwd+bwd ----
    def human_loss(p, prev, rng):
        out = human_model.apply({"params": p}, batch, 100.0, jnp.int32(0),
                                rng=rng, perturb=1.0, is_train=True)
        return (jnp.mean(out["rgb"]) + jnp.mean(out["human_density"])
                + jnp.mean(out["deform_pts_final"]) + 0.0 * prev)

    human_step = jax.jit(jax.grad(human_loss))
    hg = {"prev": jnp.float32(0.0)}

    def human_run(i):
        g = human_step(params["human"], hg["prev"], keys[i])
        hg["prev"] = jax.tree.leaves(g)[0].ravel()[0]
    for i in range(WARMUP):
        human_run(i)
    force_value(hg["prev"])
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + ITERS):
        human_run(i)
    force_value(hg["prev"])
    print(f"{'human fwd+bwd':28s} "
          f"{(time.perf_counter() - t0) / ITERS * 1e3:9.2f} ms/call",
          flush=True)

    # ---- full joint step, one dispatch per step (bench protocol) ----
    raw_step = stage3.make_train_step(cfg, scene_model, human_model, opt)

    def chained_step(ps, os_, b, prev_loss, iter_f, rng):
        it = iter_f + 0.0 * prev_loss
        new_p, _, losses = raw_step(ps, os_, None, b, it, rng)
        probe = sum(jnp.sum(leaf) for leaf in jax.tree.leaves(new_p))
        return losses["loss"] + 0.0 * probe

    step = jax.jit(chained_step)
    loss = jnp.float32(0.0)
    for i in range(WARMUP):
        loss = step(params, opt_state, batch, loss,
                    jnp.float32(100.0 + i), keys[i])
    force_value(loss)
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + ITERS):
        loss = step(params, opt_state, batch, loss,
                    jnp.float32(100.0 + i), keys[i])
    force_value(loss)
    full_dt = (time.perf_counter() - t0) / ITERS
    print(f"{'full step (per-dispatch)':28s} {full_dt * 1e3:9.2f} ms/call",
          flush=True)

    # ---- K steps inside one lax.scan dispatch ----
    K = 8

    def scan_steps(ps, os_, b, iter0, rng):
        def body(carry, k):
            p, o, it = carry
            new_p, new_o, losses = raw_step(p, o, None, b, it, k)
            return (new_p, new_o, it + 1.0), losses["loss"]
        ks = jax.random.split(rng, K)
        (p, o, _), ls = jax.lax.scan(body, (ps, os_, iter0), ks)
        probe = sum(jnp.sum(leaf) for leaf in jax.tree.leaves(p))
        return ls[-1] + 0.0 * probe

    sstep = jax.jit(scan_steps)
    out = sstep(params, opt_state, batch, jnp.float32(100.0), keys[0])
    force_value(out)
    out = sstep(params, opt_state, batch, jnp.float32(101.0), keys[1])
    force_value(out)
    t0 = time.perf_counter()
    NCALL = 3
    prev = out
    for i in range(NCALL):
        prev = sstep(params, opt_state, batch,
                     jnp.float32(102.0 + i) + 0.0 * prev, keys[2 + i])
    force_value(prev)
    dt = (time.perf_counter() - t0) / (NCALL * K)
    print(f"{'full step (scan x%d)' % K:28s} {dt * 1e3:9.2f} ms/step",
          flush=True)


if __name__ == "__main__":
    main()
