"""State-embedding selection from scalar time + transition times.

The reference implements state switching as an unrolled if/elif ladder over
up to 7 states with a +-1e-5 epsilon
(ref: 1st_State-Conditional_Scene/src/model/mipnerf360/model.py:138-209 and
2nd_State_Conditional_Human-Object/core/nets/human_nerf/network.py:177-245).
Here it is a single branch-free gatherable expression, so `time` can be a
traced scalar (or batched) under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

STATE_EPS = 1e-5


def state_index(time, transitions: jnp.ndarray | None):
    """Map time -> state index with the reference's epsilon ladder semantics.

    state 0:      time <  T0 - eps
    state k>=1:   time <= Tk + eps  (first k that matches)
    state K:      otherwise
    """
    if transitions is None or transitions.shape[0] == 0:
        return jnp.zeros_like(jnp.asarray(time), dtype=jnp.int32)
    time = jnp.asarray(time)
    first = (time >= transitions[0] - STATE_EPS).astype(jnp.int32)
    if transitions.shape[0] > 1:
        rest = jnp.sum(
            (time[..., None] > transitions[1:] + STATE_EPS).astype(jnp.int32),
            axis=-1)
    else:
        rest = 0
    return first + first * rest
