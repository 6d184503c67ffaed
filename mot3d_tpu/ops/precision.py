"""Matmul-precision control.

On TPU, float32 matmuls default to bfloat16 MXU passes; the geometry core
(pose solving, covariance/SVD, pairwise distances) needs true float32.  The
model forward/backward paths intentionally stay at the fast default.
"""

from __future__ import annotations

import functools

import jax


def high_precision(fn):
    """Decorator: trace `fn` under float32 (highest) matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
