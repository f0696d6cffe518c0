"""Training loop drivers for the three stages.

Replaces the reference's PyTorch-Lightning Trainer orchestration
(ref: {1st,2nd,3rd}/run.py): one python loop per stage around a single
jitted train step, with
  * step-time / rays-per-sec counters (the reference only had a TQDM bar;
    SURVEY.md §5 'tracing/profiling: none'),
  * JSONL metric logging + optional jax.profiler traces,
  * Orbax best/last checkpoints carrying FULL train state
    ({params, opt_state, step, rng}) so --resume_training continues LR
    schedules and Adam moments, matching Lightning .ckpt contents
    (ref: 1st run.py:124-131,158-160),
  * host-side batch prefetch (the reference used multi-worker DataLoaders;
    ref 2nd core/data/create_dataset.py:59-75),
  * in-training progress eval at steps {100,300,1000,2500} + every
    dump_interval with the empty-render trap
    (ref: 2nd model.py:600-603,545-547),
  * NaN detection that halts with context instead of the reference's
    pdb traps (3rd model.py:1611-1614).
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hosnerf_tpu.train import checkpoints as ckpt_lib

# the reference's early-feedback steps (2nd model.py:600-601)
PROGRESS_STEPS = (100, 300, 1000, 2500)


class MetricLogger:
    """JSONL + stdout + TensorBoard metric logging with
    step-time/rays-per-sec counters (TB scalar events mirror the
    reference's Lightning TensorBoardLogger artifacts,
    ref: 1st run.py:101-104; writer: utils/tb_writer.py)."""

    def __init__(self, logdir: str, log_every: int = 100):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.jsonl")
        self.log_every = log_every
        self._f = open(self.path, "a")
        from hosnerf_tpu.utils.tb_writer import TBWriter
        self._tb = TBWriter(logdir)
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
        for k, v in rec.items():
            if k != "step":
                self._tb.add_scalar(f"train/{k}", v, step)
        self._tb.flush()
        print(f"[step {step}] " + " ".join(
            f"{k}={v:.5g}" for k, v in rec.items() if k != "step"),
            flush=True)

    def close(self):
        self._f.close()
        self._tb.close()


def check_finite(step: int, loss) -> None:
    if not np.isfinite(float(loss)):
        raise FloatingPointError(
            f"non-finite loss at step {step}: {float(loss)} — halting "
            "(reference would drop into pdb here)")


class EmptyRenderError(RuntimeError):
    """Raised when an in-training progress render produces only background
    (the reference's 'Produce empty images.' trap, 2nd model.py:545-560)."""


class BatchPrefetcher:
    """Host-side prefetch thread: overlaps `sample_fn()` (cv2 decode, patch
    sampling, device put) with the running device step. Depth-`depth` queue;
    exceptions in the worker propagate to the consumer."""

    _SENTINEL = object()

    def __init__(self, sample_fn: Callable[[], Any], depth: int = 2):
        self._fn = sample_fn
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._work, daemon=True)
        self._t.start()

    def _work(self):
        while not self._stop.is_set():
            try:
                item = (True, self._fn())
            except BaseException as e:  # propagate to consumer
                item = (False, e)
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.2)
                    break
                except queue.Full:
                    continue
            if not item[0]:
                return

    def get(self):
        ok, item = self._q.get()
        if not ok:
            self.close()
            raise item
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._t.join(timeout=2.0)


def run_training(
        *, num_steps: int, sample_batch: Callable[[], Dict[str, Any]],
        step_fn: Callable, init_carry: tuple, logdir: str,
        rays_per_step: Optional[int] = None, log_every: int = 100,
        checkpoint_every: int = 2000,
        extra_step_args: Callable[[int, jax.Array], tuple] = None,
        val_fn: Optional[Callable[[tuple, int], float]] = None,
        val_every: int = 50_000, rng: Optional[jax.Array] = None,
        profile_steps: Optional[tuple] = None,
        lr_schedule: Optional[Callable[[int], float]] = None,
        start_step: int = 0,
        progress_fn: Optional[Callable[[tuple, int], Dict]] = None,
        progress_every: int = 0,
        abort_on_empty: bool = True,
        prefetch: int = 2) -> tuple:
    """Generic loop: carry = (params, opt_state, *rest).

    start_step: resume point — the loop runs [start_step, num_steps) so LR
    schedules (driven by the traced step value) continue where they left
    off. progress_fn(carry, step) -> dict (may contain 'is_empty_img');
    called at PROGRESS_STEPS and every `progress_every` (the reference's
    cfg.progress.dump_interval=5000).
    """
    carry = init_carry
    rng = rng if rng is not None else jax.random.key(0)
    logger = MetricLogger(logdir, log_every)
    ckptr = ckpt_lib.BestLastCheckpointer(os.path.join(logdir, "ckpt"))

    def train_state(next_step):
        # `next_step` = number of COMPLETED steps = the step to resume
        # from (params/opt_state/rng already include the just-finished
        # step's update and split).
        return ckpt_lib.pack_train_state(carry, next_step, rng)

    fetcher = (BatchPrefetcher(sample_batch, prefetch) if prefetch
               else None)
    try:
        for step in range(start_step, num_steps):
            if profile_steps and step == profile_steps[0]:
                jax.profiler.start_trace(os.path.join(logdir, "profile"))
            batch = fetcher.get() if fetcher else sample_batch()
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
                ckptr.save_last(train_state(step + 1))
            if val_fn is not None and step and step % val_every == 0:
                monitored = val_fn(carry, step)
                ckptr.maybe_save_best(train_state(step + 1), monitored)
            if progress_fn is not None and step and (
                    step in PROGRESS_STEPS
                    or (progress_every and step % progress_every == 0)):
                prog = progress_fn(carry, step)
                if prog:
                    print(f"[progress {step}] " + " ".join(
                        f"{k}={v}" for k, v in prog.items()
                        if v is not None), flush=True)
                if prog and prog.get("is_empty_img"):
                    msg = (f"progress render at step {step} produced only "
                           "background (reference: 'Produce empty "
                           "images.')")
                    if abort_on_empty:
                        raise EmptyRenderError(msg)
                    print("WARNING: " + msg, flush=True)
    finally:
        if fetcher:
            fetcher.close()

    ckptr.save_last(train_state(num_steps))
    logger.close()
    return carry
