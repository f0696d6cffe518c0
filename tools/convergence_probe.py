"""Long-horizon convergence probe at PRODUCTION widths (VERDICT r4 #5).

Trains stage 1 (scene) and stage 2 (human) for N steps (default 5000)
on the synthetic mini dataset through the REAL loaders, at production
sizes with the production TPU kernel stack (bf16 trunks, fused
embed+trunk MLPs, pair-grid LBS, liveness-sorted sparse pipeline),
cycling frames like real training. Logs loss (+psnr) every LOG_EVERY
steps, asserts finiteness at every log point and improvement at the
end, and writes curves to tools/convergence/probe_<stage>.json — the
obtainable training-dynamics evidence while real captures are absent
from this environment (KNOWN_GAPS #2).

Slow (~15-25 min on the tunneled v5e) — NOT in default CI.
Usage: python tools/convergence_probe.py [steps] [stage1|stage2|both]
"""

import json
import os
import sys
import tempfile
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

from hosnerf_tpu.data import scene_loader, scene_pipeline, synthetic
from hosnerf_tpu.data.human_dataset import HumanDataset
from hosnerf_tpu.train import stage1, stage2

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
WHICH = sys.argv[2] if len(sys.argv) > 2 else "both"
LOG_EVERY = 50
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "convergence")


def _emit(stage, log, extra):
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"probe_{stage}.json")
    with open(path, "w") as f:
        json.dump({"stage": stage, "steps": STEPS,
                   "log_every": LOG_EVERY, "curve": log, **extra}, f,
                  indent=1)
    print(f"[{stage}] wrote {path}", flush=True)


def run_stage1(root):
    scene = scene_loader.load_nerf_360_v2(
        os.path.dirname(root), os.path.basename(root), factor=1,
        near=0.2, far=30.0)
    pipe = scene_pipeline.ScenePipeline(scene, batch_size=4096)
    cfg = stage1.Stage1Config(max_steps=STEPS, near=0.2, far=30.0,
                              num_states=2, compute_dtype="bf16")
    batch = {k: jnp.asarray(v)
             for k, v in pipe.sample_train_batch().items()}
    params, opt_state, model = stage1.init_state(
        cfg, jax.random.key(0), batch)
    opt = stage1.make_optimizer(cfg)
    ds = HumanDataset(root, mode="train", mweight_volume_size=32)
    step = jax.jit(stage1.make_train_step(cfg, model, opt,
                                          transitions=ds.transitions))
    rng = jax.random.key(1)
    log = []
    t0 = time.time()
    for i in range(STEPS):
        b = {k: jnp.asarray(v)
             for k, v in pipe.sample_train_batch().items()}
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step(params, opt_state, b,
                                      jnp.float32(i), sub)
        if i % LOG_EVERY == 0 or i == STEPS - 1:
            loss = float(aux["loss"])
            psnr = float(aux["psnr"])
            assert np.isfinite(loss) and np.isfinite(psnr), (i, aux)
            log.append({"step": i, "loss": round(loss, 5),
                        "psnr": round(psnr, 3)})
            print(f"[stage1] {i:5d} loss {loss:.4f} psnr {psnr:.2f}",
                  flush=True)
    secs = time.time() - t0
    first = np.mean([e["psnr"] for e in log[:3]])
    last = np.mean([e["psnr"] for e in log[-3:]])
    if len(log) >= 6:
        assert last > first + 3.0, ("psnr did not improve", first, last)
    _emit("stage1", log, {
        "wall_secs": round(secs, 1),
        "psnr_first3_mean": round(float(first), 3),
        "psnr_last3_mean": round(float(last), 3),
        "config": "production widths (8x1024 nerf, 3x(64,64,32) "
                  "samples), bf16, 4096 rays/step"})


def run_stage2(root):
    ds = HumanDataset(root, mode="train", n_patches=2, patch_size=32,
                      mweight_volume_size=32)
    cfg = stage2.Stage2Config(compute_dtype="bf16")
    item = ds[0]
    batch = {k: jnp.asarray(v) for k, v in item.items()
             if k != "frame_name"}
    params, opt_state, model, opt = stage2.init_state(
        cfg, jax.random.key(0), batch)
    step = jax.jit(stage2.make_train_step(cfg, model, opt,
                                          transitions=ds.transitions))
    rng = jax.random.key(2)
    log = []
    t0 = time.time()
    for i in range(STEPS):
        item = ds[i % len(ds)]
        batch = {k: jnp.asarray(v) for k, v in item.items()
                 if k != "frame_name"}
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step(params, opt_state, None, batch,
                                      jnp.float32(i), sub)
        if i % LOG_EVERY == 0 or i == STEPS - 1:
            loss = float(aux["loss"])
            mse = float(aux["mse"])
            psnr = -10.0 * np.log10(max(mse, 1e-10))
            assert np.isfinite(loss) and np.isfinite(mse), (i, aux)
            log.append({"step": i, "loss": round(loss, 5),
                        "mse": round(mse, 6),
                        "psnr": round(float(psnr), 3)})
            print(f"[stage2] {i:5d} loss {loss:.4f} mse {mse:.5f} "
                  f"psnr {psnr:.2f}", flush=True)
    secs = time.time() - t0
    first = np.mean([e["loss"] for e in log[:3]])
    last = np.mean([e["loss"] for e in log[-3:]])
    if len(log) >= 6:
        assert last < first * 0.7, ("loss did not improve", first, last)
    _emit("stage2", log, {
        "wall_secs": round(secs, 1),
        "loss_first3_mean": round(float(first), 5),
        "loss_last3_mean": round(float(last), 5),
        "config": "production widths (8x256 cnl, 6x128 nr, G=32, "
                  "S=128, 2x32^2 patches), bf16, fused+sparse kernels"})


def main():
    root = os.path.join(tempfile.mkdtemp(prefix="probe_"), "mini")
    synthetic.write_mini_dataset(root, n_frames=20, res=48)
    if WHICH in ("stage1", "both"):
        run_stage1(root)
    if WHICH in ("stage2", "both"):
        run_stage2(root)
    print("convergence probe: OK", flush=True)


if __name__ == "__main__":
    main()
