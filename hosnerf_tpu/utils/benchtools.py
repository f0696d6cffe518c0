"""Honest device timing through the axon relay.

Two measured pathologies of the tunneled dev chip shaped this protocol
(both verified on hardware, round 2):

1. `jax.block_until_ready` is acknowledged by the relay BEFORE execution
   completes — timing loops that only block measure dispatch, not
   compute (round-1's recorded numbers were off by ~80x because of
   this). Only fetching a VALUE to the host forces real completion.
2. Repeated executions with identical input buffers can be served from a
   replay tier — every timed call must have distinct inputs.

`timeit_chain` therefore times K distinct-input executions and forces
one value fetch at the end; the per-call slope was verified linear in K
(688 ms/step at K in {1..40} on the stage-3 train step), so the single
round-trip amortizes away. For extra safety callers can thread a scalar
dependency between calls (see bench.py) so no call can be skipped.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax


def force_value(out) -> float:
    """Fetch one scalar from a pytree to the host (forces execution)."""
    leaf = jax.tree.leaves(out)[0]
    return float(leaf.ravel()[0])


def timeit_chain(fn: Callable, args_list: Sequence[tuple],
                 iters: int = 8, warmup: int = 2) -> float:
    """Seconds per call of `fn`, fetch-forced.

    `args_list` must hold `warmup + iters` DISTINCT argument tuples
    (distinct device buffers — vary an rng key or perturb one input).
    Warmup runs (and is fetched) first; then `iters` calls are issued
    back-to-back and the final result is fetched once.
    """
    assert len(args_list) >= warmup + iters
    out = None
    for i in range(warmup):
        out = fn(*args_list[i])
    if out is not None:
        force_value(out)
    t0 = time.perf_counter()
    for i in range(warmup, warmup + iters):
        out = fn(*args_list[i])
    force_value(out)
    return (time.perf_counter() - t0) / iters
