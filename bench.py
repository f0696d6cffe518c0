"""Benchmark: STAGE-3 training throughput (rays/sec/chip) on real hardware
— the BASELINE.json headline metric ("rays/sec/chip in stage-3 training").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Run config: production model sizes (3-level scene stack 64/64/32 samples,
8x1024 NeRF MLP; human 128 samples/ray, 8x256 canonical MLP, full LBS +
non-rigid + cycle + flow branches, joint Adam with per-group LRs), at the
reference's per-rank batch: 2 patches x 32^2 = 2048 rays/step
(ref 3rd_Complete_HOSNeRF/configs/default.yaml:84,142-154).

Measurement protocol (honest-by-construction; see utils/benchtools.py
for the two relay pathologies that shaped it):
  * EVERY timed execution has distinct device inputs (per-step rng key +
    iteration scalar) — no replay tier can serve a repeated result.
  * Each step consumes the previous step's loss (0*loss folded into the
    iteration scalar), so the chain is sequentially dependent on device
    and no lazy-execution engine can skip or reorder steps.
  * The END of the chain is fetched to the host; `block_until_ready`
    through the axon relay acks before execution and is never trusted.
    Linearity of chain time in K was verified (688 ms/step, K=1..40).
  * FLOPs tripwire: the step's model FLOPs (XLA cost analysis, fallback
    analytic) must imply <= the chip's bf16 peak; a super-peak number is
    a measurement artifact and the benchmark FAILS rather than reports.

`vs_baseline`: the reference never measured throughput (BASELINE.md).
The divisor is derived from a MEASURED anchor — the reference's full
stage-3 step timed on this host CPU at identical shapes
(bench_ref_cpu.py AB_STAGE=full) — scaled by a bracketed CPU->GPU uplift
assumption carried verbatim in the JSON (`baseline_basis`). The
BASELINE.json north star is >=5x reference-GPU rays/sec/chip.
"""

import json
import time

import os

import jax

# Persist compiles next to the repo: the stage-3 step is a multi-minute
# XLA compile through the tunnel; repeat bench runs should pay it once.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import jax.numpy as jnp

from hosnerf_tpu.data import synthetic
from hosnerf_tpu.train import stage3
from hosnerf_tpu.utils.benchtools import force_value

# --- baseline derivation: TWO independent anchors (VERDICT r3 #5).
# The reference never measured or published throughput (BASELINE.md).
#
# Anchor A (measured CPU + uplift bracket): the reference's FULL stage-3
# step (its own torch networks + the verbatim training_step merge +
# mse/lpips/cycle/flow losses + backward + Adam) takes REF_FULL_CPU_SEC
# at the same 2048-ray shapes on this host's one CPU core
# (bench_ref_cpu.py AB_STAGE=full AB_PATCH=32, measured 2026-08-19).
# Torch steps this conv/matmul-heavy gain ~500-2000x moving to an
# A100-class GPU => 4.2k-16.9k rays/s/GPU.
#
# Anchor B (FLOPs ceiling, tools/ref_flops.py): the reference trains in
# torch f32 with no AMP (Lightning precision=32; torch 2.0.1 has TF32
# matmul OFF by default), and its step executes >= 5.23 TFLOP of
# matmul/conv work at these shapes (analytic count of its layer dims,
# fwd x3 for backward) — so even at 100% MFU on an A100's 19.5 TFLOPS
# f32 peak the step takes >= 268 ms => <= 7.6k rays/s/GPU. This caps
# anchor A's bracket from above independently of the uplift guess.
#
# Combined bracket = intersection [4.2k, 7.6k]; vs_baseline divides by
# its geometric midpoint. All raw numbers ride in `baseline_basis`.
REF_FULL_CPU_SEC = 242.39
OURS_FULL_CPU_SEC = 351.31          # same anchor run, our side
GPU_UPLIFT_BRACKET = (500.0, 2000.0)
REF_STEP_FLOPS = 5.231e12           # tools/ref_flops.py, 2048 rays
A100_F32_PEAK = 19.5e12

N_PATCHES = 2  # the reference production batch per rank
RAYS = N_PATCHES * 32 * 32
WARMUP = 3
ITERS = 20

# Chip peaks for the tripwire / MFU line. v5e: 197 TFLOPS bf16.
BF16_PEAK_TFLOPS = 197.0


# Executed (sample, bone) pair density of the pair-grid inverse-LBS
# kernel on production-shaped batches (tools/pg_density_study.py; the
# kernel only runs alive pairs, so its FLOPs scale with this).
PG_EXEC_DENSITY = 0.395
# Live-suffix fraction: the liveness-sorted human pipeline (round 5)
# runs the non-rigid/canonical MLPs and the forward LBS only on the
# ~45% of samples with any bone support (tools/fg_density_study.py
# tile_alive; dead prefix skipped by traced grid offsets).
LIVE_FRACTION = 0.46


def pallas_flops_per_step(cfg) -> float:
    """Analytic per-step FLOPs of the Pallas custom kernels, which XLA's
    cost_analysis() CANNOT see (VERDICT r4 #3 — r4's headline MFU
    undercounted by omitting these). Dominant matmuls only.

    Factors: the fused embed+trunk MLP kernels (ops/pallas/mlp.py) and
    both LBS kernels (ops/pallas/lbs.py) keep no residuals and recompute
    the forward inside the backward, so fwd+bwd executes ~4x the forward
    matmul work (fwd + recompute + dW + dx); the pair-grid inverse
    backward runs 4 tap-plane matmuls (zc, m2, m3, dvol) per recomputed
    forward -> 5x."""
    rays = cfg.n_patches * cfg.patch_size ** 2
    n = rays * cfg.n_samples
    g = cfg.mweight_volume_size
    b = cfg.total_bones
    # fused embed+trunk MLPs (exact layer dims incl. skip concats):
    # CanonicalMLP 8x256 (in 127, skip 383 at L5, head 4) over N samples;
    # NonRigidMLP 6x128 (in 111, skip 164 at L4, head 3) over 3N samples
    # (inverse branch N + the 2N concatenated cycle/flow forward pass)
    cnl_mac = 127 * 256 + 6 * 256 * 256 + 383 * 256 + 256 * 4
    nr_mac = 111 * 128 + 4 * 128 * 128 + 164 * 128 + 128 * 3
    mlps = 4 * 2.0 * LIVE_FRACTION * (n * cnl_mac + 3 * n * nr_mac)
    # inverse LBS (pair-grid): executed pairs x [1, G^2] @ [G^2, G]
    inv = 5 * PG_EXEC_DENSITY * n * b * (g * g * g) * 2.0
    # forward LBS (shared_blend): [1, G^2] @ [G^2, B*G] per live sample
    fwd_lbs = 4 * LIVE_FRACTION * n * (g * g * b * g) * 2.0
    return mlps + inv + fwd_lbs


def analytic_flops_per_step(cfg) -> float:
    """Full-analytic fallback (XLA-visible scene stack + Pallas kernels)
    when cost_analysis is unavailable. Scene = fwd + 2x bwd (no remat at
    the 2-patch point), dominant matmuls only."""
    rays = cfg.n_patches * cfg.patch_size ** 2
    prop = 2 * rays * 64 * (4 * 256 * 256 + 2 * 256 * 80) * 2
    nerf = rays * 32 * (8 * 1024 * 1024 + 2 * 1024 * 80) * 2
    return 3.0 * (prop + nerf) + pallas_flops_per_step(cfg)


def _require_live_backend(timeout_s: int = 180) -> None:
    """Fail fast with a clear message if the accelerator is unreachable:
    with the TPU tunnel down, in-process jax.devices() blocks ~20 min
    before raising. The probe runs in a time-bounded subprocess."""
    import subprocess
    import sys
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices())"],
            capture_output=True, text=True, timeout=timeout_s)
        if probe.returncode == 0:
            return
        detail = probe.stderr.strip().splitlines()[-1:]
    except subprocess.TimeoutExpired:
        detail = [f"backend init still blocked after {timeout_s}s"]
    raise SystemExit(
        "bench.py: accelerator backend unreachable (TPU tunnel down?); "
        "refusing to benchmark. " + " ".join(detail))


def main():
    _require_live_backend()
    # bf16 MLP trunks: the production default. Measured quality-neutral
    # on convergence probes (stage-1 300 steps: 43.1 dB bf16 vs 42.5 dB
    # f32; stage-2 200 steps: loss 0.053 bf16 vs 0.058 f32) and ~7%
    # faster at the 2-patch batch.
    cfg = stage3.Stage3Config(n_patches=N_PATCHES, compute_dtype="bf16")
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.composed_batch(N_PATCHES, 32, grid_size=32).items()}
    params, opt_state, scene_model, human_model, opt = stage3.init_state(
        cfg, jax.random.key(0), batch)
    raw_step = stage3.make_train_step(cfg, scene_model, human_model, opt)

    def chained_step(ps, os_, b, prev_loss, iter_f, rng):
        # 0*prev_loss makes each step depend on the previous one ON
        # DEVICE without changing the math — the chain cannot be
        # skipped, reordered, or replayed.
        it = iter_f + 0.0 * prev_loss
        new_p, _, losses = raw_step(ps, os_, None, b, it, rng)
        # The probe consumes EVERY updated parameter: without it XLA
        # dead-code-eliminates the backward pass + optimizer (verified:
        # 94 ms "steps" vs 330 ms real) since only the loss is returned.
        probe = sum(jnp.sum(leaf) for leaf in jax.tree.leaves(new_p))
        return losses["loss"] + 0.0 * probe

    step = jax.jit(chained_step)
    keys = [jax.random.fold_in(jax.random.key(1), i)
            for i in range(WARMUP + ITERS)]
    jax.block_until_ready(keys[-1])

    loss = jnp.float32(0.0)
    for i in range(WARMUP):
        loss = step(params, opt_state, batch, loss,
                    jnp.float32(100.0 + i), keys[i])
    lv = force_value(loss)

    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + ITERS):
        loss = step(params, opt_state, batch, loss,
                    jnp.float32(100.0 + i), keys[i])
    lv = force_value(loss)
    dt = time.perf_counter() - t0
    sec_per_step = dt / ITERS

    import math
    assert math.isfinite(lv), "non-finite training loss"

    # FLOPs accounting (VERDICT r4 #3): the step's MLP trunks + LBS run
    # inside Pallas custom calls whose FLOPs XLA cost_analysis cannot
    # see, so the PRIMARY count is cost_analysis (XLA-visible work) +
    # the analytic Pallas-kernel count; full-analytic is the fallback.
    # cost_analysis alone is carried as a secondary field for r3/r4
    # comparability (restatement note in BASELINE.md).
    xla_flops = None
    try:
        cost = step.lower(params, opt_state, batch, loss,
                          jnp.float32(100.0), keys[0]).compile(
                              ).cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            xla_flops = float(c.get("flops", 0.0)) or None
    except Exception:
        xla_flops = None
    pallas_flops = pallas_flops_per_step(cfg)
    if xla_flops:
        flops = xla_flops + pallas_flops
        flops_src = "xla_cost_analysis+pallas_analytic"
    else:
        flops, flops_src = analytic_flops_per_step(cfg), "analytic"

    implied_tflops = flops / sec_per_step / 1e12
    mfu = implied_tflops / BF16_PEAK_TFLOPS
    # Tripwire: throughput implying super-peak sustained FLOPS is a
    # measurement artifact (replay/deferred execution) — refuse it.
    assert implied_tflops <= BF16_PEAK_TFLOPS * 1.05, (
        f"implied {implied_tflops:.0f} TFLOPS exceeds chip peak "
        f"{BF16_PEAK_TFLOPS} — measurement artifact, refusing to report")

    # secondary point: 8-patch batch (the framework's preferred larger
    # operating point; 4x the reference per-rank batch) — same honest
    # chained protocol, fewer iters
    big_rays = 8 * 32 * 32
    big_sec = None
    # free the 2-patch state first: the 8-patch step peaks ~13.7 GB of
    # the 16 GB HBM (tools/memcheck_8patch.py), so stale buffers from the
    # primary point must go. Outside the try so a cleanup failure
    # surfaces distinctly; guarded for non-array leaves.
    for leaf in jax.tree.leaves((params, opt_state, batch)):
        if hasattr(leaf, "delete"):
            leaf.delete()
    hbm8 = None
    try:
        # 8-patch runs fully DENSE since round 4: the fused embed+trunk
        # kernels keep no layer activations (custom-vjp residuals are
        # just inputs), so the human trunks' 4.3 GB bf16 residuals are
        # gone — measured 535.8 ms dense vs round-3's best 606 ms
        # (human-heavy remat), peak 13.15 GB of 16 (memory_analysis).
        cfg8 = stage3.Stage3Config(n_patches=8, compute_dtype="bf16",
                                   remat="none", scene_remat="none",
                                   human_remat="none")
        batch8 = {k: jnp.asarray(v) for k, v in
                  synthetic.composed_batch(8, 32, grid_size=32).items()}
        p8, o8, sm8, hm8, opt8 = stage3.init_state(
            cfg8, jax.random.key(0), batch8)
        raw8 = stage3.make_train_step(cfg8, sm8, hm8, opt8)

        def chained8(ps, os_, b, prev_loss, iter_f, rng):
            it = iter_f + 0.0 * prev_loss
            new_p, _, losses = raw8(ps, os_, None, b, it, rng)
            probe = sum(jnp.sum(leaf) for leaf in jax.tree.leaves(new_p))
            return losses["loss"] + 0.0 * probe

        step8 = jax.jit(chained8)
        l8 = jnp.float32(0.0)
        for i in range(2):
            l8 = step8(p8, o8, batch8, l8, jnp.float32(100.0 + i), keys[i])
        force_value(l8)
        t0 = time.perf_counter()
        for i in range(2, 10):
            l8 = step8(p8, o8, batch8, l8, jnp.float32(100.0 + i), keys[i])
        force_value(l8)
        big_sec = (time.perf_counter() - t0) / 8
        # remat-accurate FLOPs for the 8-patch tripwire (remat=True
        # executes re-forward FLOPs the 2-patch non-remat count misses);
        # fall back to the conservative 4x scaling if cost analysis is
        # unavailable.
        flops8 = None
        try:
            compiled8 = step8.lower(p8, o8, batch8, l8, jnp.float32(100.0),
                                    keys[0]).compile()
            cost8 = compiled8.cost_analysis()
            if cost8:
                c8 = cost8[0] if isinstance(cost8, (list, tuple)) else cost8
                flops8 = float(c8.get("flops", 0.0)) or None
            mem8 = compiled8.memory_analysis()
            if mem8 is not None:
                hbm8 = (getattr(mem8, "temp_size_in_bytes", 0)
                        + getattr(mem8, "argument_size_in_bytes", 0)
                        + getattr(mem8, "output_size_in_bytes", 0)
                        - getattr(mem8, "alias_size_in_bytes", 0)) / 2**30
        except Exception:
            flops8 = None
        implied8 = ((flops8 + pallas_flops_per_step(cfg8)) if flops8
                    else flops * 4.0) / big_sec / 1e12
        assert implied8 <= BF16_PEAK_TFLOPS * 1.05
    except Exception as e:  # secondary point only — report, don't fail
        import sys
        import traceback
        print(f"8-patch bench point failed: {e!r}", file=sys.stderr)
        traceback.print_exc(file=sys.stderr)
        big_sec = None

    n_chips = len(jax.devices())
    rays_per_sec_per_chip = RAYS / sec_per_step / n_chips
    # anchor A: CPU-measured step scaled by the uplift bracket
    a_lo, a_hi = [RAYS / (REF_FULL_CPU_SEC / u)
                  for u in GPU_UPLIFT_BRACKET]
    # anchor B: FLOPs ceiling (100% MFU on A100 f32)
    b_cap = RAYS / (REF_STEP_FLOPS / A100_F32_PEAK)
    ref_lo, ref_hi = a_lo, min(a_hi, b_cap)
    ref_mid = (ref_lo * ref_hi) ** 0.5
    print(json.dumps({
        "metric": "stage3_train_rays_per_sec_per_chip",
        "value": round(float(rays_per_sec_per_chip), 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(float(rays_per_sec_per_chip / ref_mid), 3),
        "sec_per_step": round(sec_per_step, 5),
        "model_tflops_per_step": round(flops / 1e12, 4),
        "flops_source": flops_src,
        "model_tflops_xla_only": (round(xla_flops / 1e12, 4)
                                  if xla_flops else None),
        "model_tflops_pallas": round(pallas_flops / 1e12, 4),
        "implied_tflops": round(implied_tflops, 2),
        "mfu_vs_bf16_peak": round(mfu, 4),
        "baseline_basis": {
            "anchor_a": ("bench_ref_cpu.py AB_STAGE=full AB_PATCH=32 — "
                         "the reference's COMPLETE stage-3 step at "
                         "identical 2048-ray shapes on this host CPU, "
                         "2026-08-19, scaled by a 500-2000x CPU->GPU "
                         "uplift bracket"),
            "ref_full_step_cpu_sec": REF_FULL_CPU_SEC,
            "ours_full_step_cpu_sec": OURS_FULL_CPU_SEC,
            "gpu_uplift_bracket": list(GPU_UPLIFT_BRACKET),
            "anchor_b": ("tools/ref_flops.py — the reference's analytic "
                         "5.23 TFLOP/step in torch f32 (no AMP, TF32 "
                         "matmul off) cannot beat 268 ms/step even at "
                         "100% MFU on an A100's 19.5 TFLOPS f32 peak"),
            "ref_step_flops": REF_STEP_FLOPS,
            "ref_rays_s_flops_ceiling": round(b_cap, 1),
            "ref_gpu_rays_per_sec_bracket": [round(ref_lo, 1),
                                             round(ref_hi, 1)],
            "ref_gpu_rays_per_sec_mid_geo": round(ref_mid, 1),
            "vs_baseline_bracket": [
                round(float(rays_per_sec_per_chip / ref_hi), 3),
                round(float(rays_per_sec_per_chip / ref_lo), 3)],
        },
        **({"sec_per_step_8patch": round(big_sec, 5),
            "rays_per_sec_8patch": round(big_rays / big_sec / n_chips, 1),
            **({"hbm_peak_gb_8patch": round(hbm8, 2)} if hbm8 else {})}
           if big_sec else {}),
    }))


if __name__ == "__main__":
    main()
