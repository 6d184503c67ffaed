"""LR schedules: detectron2's WarmupMultiStepLR shape in optax.

The reference trains detection with SOLVER.LR_SCHEDULER_NAME =
"WarmupMultiStepLR" (`Detection/cfg_setup.py:109-114`) — linear warmup from
`base_lr * warmup_factor` over `warmup_iters`, then a multiplicative
`gamma` drop at each milestone in `steps`.  NOTE the reference's shipped
values neutralise it (WARMUP_ITERS=0, WARMUP_FACTOR=1, STEPS=[], GAMMA=1 →
a constant 8e-4), so constant LR *is* exact parity; this module provides
the full schedule shape so real-data runs can enable the detectron2-default
warmup (1000 iters, factor 1e-3) via config without code changes.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp


def warmup_multistep(base_lr: float,
                     warmup_iters: int = 0,
                     warmup_factor: float = 1.0,
                     steps: Sequence[int] = (),
                     gamma: float = 1.0):
    """optax-compatible schedule fn: step -> lr.

    Semantics match detectron2's WarmupParamScheduler over MultiStepLR
    (linear warmup: lr(t) = base * (warmup_factor + (1-warmup_factor) *
    t / warmup_iters) for t < warmup_iters; afterwards
    base * gamma^(#milestones passed)).
    """
    milestones = jnp.asarray(sorted(steps), jnp.int32)

    def schedule(count: Union[int, jnp.ndarray]) -> jnp.ndarray:
        t = jnp.asarray(count, jnp.float32)
        if warmup_iters > 0:
            alpha = jnp.clip(t / float(warmup_iters), 0.0, 1.0)
            warm = warmup_factor * (1.0 - alpha) + alpha
        else:
            warm = 1.0
        if milestones.size:
            decay = gamma ** jnp.sum(
                jnp.asarray(count, jnp.int32) >= milestones)
        else:
            decay = 1.0
        return base_lr * warm * decay

    return schedule
