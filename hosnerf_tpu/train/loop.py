"""Training loop drivers for the three stages.

Replaces the reference's PyTorch-Lightning Trainer orchestration
(ref: {1st,2nd,3rd}/run.py): one python loop per stage around a single
jitted train step, with
  * step-time / rays-per-sec counters (the reference only had a TQDM bar;
    SURVEY.md §5 'tracing/profiling: none'),
  * JSONL metric logging + optional jax.profiler traces,
  * Orbax best/last checkpoints (+ periodic validation for stage 1),
  * NaN detection that halts with context instead of the reference's
    pdb traps (3rd model.py:1611-1614).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hosnerf_tpu.train import checkpoints as ckpt_lib


class MetricLogger:
    """JSONL + stdout metric logging with step-time/rays-per-sec counters."""

    def __init__(self, logdir: str, log_every: int = 100):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.jsonl")
        self.log_every = log_every
        self._f = open(self.path, "a")
        self._t_last = time.perf_counter()
        self._step_last = 0

    def log(self, step: int, metrics: Dict[str, Any],
            rays_per_step: Optional[int] = None,
            lr: Optional[float] = None):
        """`lr` mirrors the reference's LearningRateMonitor
        (1st run.py LearningRateMonitor callback)."""
        if step % self.log_every:
            return
        if lr is not None:
            metrics = {**metrics, "lr": lr}
        now = time.perf_counter()
        dt = now - self._t_last
        n = max(step - self._step_last, 1)
        rec = {"step": step,
               **{k: float(v) for k, v in metrics.items()},
               "sec_per_step": dt / n}
        if rays_per_step:
            rec["rays_per_sec"] = rays_per_step * n / dt
        self._t_last = now
        self._step_last = step
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        print(f"[step {step}] " + " ".join(
            f"{k}={v:.5g}" for k, v in rec.items() if k != "step"),
            flush=True)

    def close(self):
        self._f.close()


def check_finite(step: int, loss) -> None:
    if not np.isfinite(float(loss)):
        raise FloatingPointError(
            f"non-finite loss at step {step}: {float(loss)} — halting "
            "(reference would drop into pdb here)")


def run_training(
        *, num_steps: int, sample_batch: Callable[[], Dict[str, Any]],
        step_fn: Callable, init_carry: tuple, logdir: str,
        rays_per_step: Optional[int] = None, log_every: int = 100,
        checkpoint_every: int = 2000,
        extra_step_args: Callable[[int, jax.Array], tuple] = None,
        val_fn: Optional[Callable[[tuple, int], float]] = None,
        val_every: int = 50_000, rng: Optional[jax.Array] = None,
        profile_steps: Optional[tuple] = None,
        lr_schedule: Optional[Callable[[int], float]] = None) -> tuple:
    """Generic loop: carry = (params, opt_state, *rest)."""
    carry = init_carry
    rng = rng if rng is not None else jax.random.key(0)
    logger = MetricLogger(logdir, log_every)
    ckptr = ckpt_lib.BestLastCheckpointer(os.path.join(logdir, "ckpt"))

    for step in range(num_steps):
        if profile_steps and step == profile_steps[0]:
            jax.profiler.start_trace(os.path.join(logdir, "profile"))
        batch = sample_batch()
        rng, sub = jax.random.split(rng)
        carry_out = step_fn(*carry, batch, jnp.float32(step), sub)
        carry, aux = carry_out[:-1], carry_out[-1]
        if profile_steps and step == profile_steps[1]:
            jax.block_until_ready(aux["loss"])
            jax.profiler.stop_trace()

        logger.log(step, aux, rays_per_step,
                   lr=(float(lr_schedule(step)) if lr_schedule
                       and step % log_every == 0 else None))
        if step % 500 == 0:
            check_finite(step, aux["loss"])
        if checkpoint_every and step and step % checkpoint_every == 0:
            ckptr.save_last({"params": carry[0], "step": step})
        if val_fn is not None and step and step % val_every == 0:
            monitored = val_fn(carry, step)
            ckptr.maybe_save_best({"params": carry[0], "step": step},
                                  monitored)

    ckptr.save_last({"params": carry[0], "step": num_steps})
    logger.close()
    return carry
