"""Pose-quality metrics (NOCS-paper regime).

Reference `Detection/inference/inference_metrics.py`:
  - rotation error = geodesic angle between normalised rotations, minimised
    over a 180-degree flip about Y (symmetric furniture), in degrees (:23-46);
  - location error = L2 in metres (:48-57).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mot3d_tpu.ops.precision import high_precision

# NumPy (not jnp) so importing this module never initialises a JAX backend.
_Y_180 = np.diag(np.array([-1.0, 1.0, -1.0], np.float32))


@high_precision
def rotation_error_deg(pred_rot: jax.Array, gt_rot: jax.Array) -> jax.Array:
    """Geodesic rotation error (degrees), min over the 180-deg Y flip.

    pred_rot, gt_rot: (..., 3, 3).  Both are scale-normalised by cbrt(det)
    first (the reference's predicted rotation carries the isotropic scale).
    """
    def normalise(r):
        det = jnp.linalg.det(r)
        return r / jnp.cbrt(jnp.where(jnp.abs(det) < 1e-20, 1.0, det))[..., None, None]

    r1 = normalise(pred_rot)
    r2 = normalise(gt_rot)
    rel = r1 @ jnp.swapaxes(r2, -1, -2)
    rel_flip = r1 @ _Y_180 @ jnp.swapaxes(r2, -1, -2)

    def angle(r):
        tr = jnp.trace(r, axis1=-2, axis2=-1)
        return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))

    theta = jnp.minimum(angle(rel), angle(rel_flip))
    return theta * (180.0 / jnp.pi)


def location_error(pred_loc: jax.Array, gt_loc: jax.Array) -> jax.Array:
    """L2 distance (..., 3) -> (...)."""
    return jnp.linalg.norm(pred_loc - gt_loc, axis=-1)
