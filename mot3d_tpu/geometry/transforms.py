"""Rotation / rigid-transform helpers.

TPU-native replacements for the reference's `mathutils` (Blender C) Euler
conversions (`Tracking/datasets/graph_dataset.py:378-390`,
`Tracking/tracker/tracking_front.py:1016-1040`), `cam2world`
(`PoseEst/pose_estimation.py:59-70`) and box-corner canonicalisation
(`PoseEst/pose_estimation.py:72-93`).  Everything is jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mot3d_tpu.ops.precision import high_precision


def _rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])


def _rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def _rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


@high_precision
def euler_to_rotmat(euler: jax.Array) -> jax.Array:
    """Blender-convention XYZ Euler angles (radians) -> 3x3 rotation matrix.

    Matches `mathutils.Euler((x, y, z)).to_matrix()`: extrinsic rotations about
    x, then y, then z, i.e. R = Rz @ Ry @ Rx.  Accepts (..., 3).
    """
    euler = jnp.asarray(euler)
    if euler.ndim > 1:
        return jax.vmap(euler_to_rotmat)(euler.reshape(-1, 3)).reshape(
            euler.shape[:-1] + (3, 3)
        )
    return _rot_z(euler[2]) @ _rot_y(euler[1]) @ _rot_x(euler[0])


def _grad_safe_arctan2(y: jax.Array, x: jax.Array) -> jax.Array:
    """arctan2 whose backward survives (0, 0): the VJP is
    (x g_y - y g_x) / (x^2 + y^2) = 0/0 -> NaN at the origin — and a NaN
    there poisons the whole gradient EVEN under a zero cotangent (the
    0 * inf genus; see NOTES_ROUND3.md umeyama fixes).  The origin's value
    is arbitrary anyway; sanitise the inputs so its gradient is 0."""
    origin = jnp.logical_and(y == 0.0, x == 0.0)
    return jnp.arctan2(jnp.where(origin, 0.0, y),
                       jnp.where(origin, 1.0, x))


def rotmat_to_euler(rot: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> XYZ Euler (radians), inverse of euler_to_rotmat.

    Uses the standard decomposition of R = Rz Ry Rx; gimbal-safe via
    clipping, and BACKWARD-safe at the gimbal poles: arcsin'(+-1) = inf and
    arctan2(0, 0) both emit non-finite partials that poison the joint
    gradient even when this euler's cotangent is zero (root cause of the
    round-4 differentiable-pose training NaN — clean axis-aligned
    rotations emerge as the detector converges, sy hits exactly +-1, and
    the 0 * inf contaminates the shared backbone gradient through the
    empty-graph where()).  At the poles the output is pinned to
    sign(sy) * pi/2 with zero gradient (the true derivative is unbounded;
    forward error of the pin is < 4.5e-4 rad inside the 1e-7 band).
    Accepts (..., 3, 3).
    """
    rot = jnp.asarray(rot)
    sy = jnp.clip(-rot[..., 2, 0], -1.0, 1.0)
    at_pole = jnp.abs(sy) >= 1.0 - 1e-7
    y = jnp.where(at_pole, jnp.sign(sy) * (jnp.pi / 2),
                  jnp.arcsin(jnp.where(at_pole, 0.0, sy)))
    cy = jnp.sqrt(jnp.clip(1.0 - sy * sy, 1e-12, None))
    # Non-degenerate branch.
    x = _grad_safe_arctan2(rot[..., 2, 1], rot[..., 2, 2])
    z = _grad_safe_arctan2(rot[..., 1, 0], rot[..., 0, 0])
    # Degenerate (|cos y| ~ 0): fold everything into x.
    x_deg = _grad_safe_arctan2(-rot[..., 1, 2], rot[..., 1, 1])
    z_deg = jnp.zeros_like(z)
    degenerate = cy < 1e-6
    x = jnp.where(degenerate, x_deg, x)
    z = jnp.where(degenerate, z_deg, z)
    return jnp.stack([x, y, z], axis=-1)


def quaternion_from_euler(euler: jax.Array) -> jax.Array:
    """XYZ Euler -> quaternion [x, y, z, w].

    Same formula as `Tracking/utils/train_utils.py:47-65`
    (get_quaternion_from_euler), vectorised: accepts (..., 3).
    """
    roll, pitch, yaw = euler[..., 0], euler[..., 1], euler[..., 2]
    cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
    cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
    cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
    qx = sr * cp * cy - cr * sp * sy
    qy = cr * sp * cy + sr * cp * sy
    qz = cr * cp * sy - sr * sp * cy
    qw = cr * cp * cy + sr * sp * sy
    return jnp.stack([qx, qy, qz, qw], axis=-1)


@high_precision
def transform_points(points: jax.Array, rot: jax.Array, trans: jax.Array) -> jax.Array:
    """Apply y = R @ p + t to points (..., N, 3)."""
    return points @ rot.T + trans


@high_precision
def cam_to_world(points: jax.Array, campose: jax.Array) -> jax.Array:
    """Camera-space points (N, 3) -> world via 4x4 campose.

    Reference `PoseEst/pose_estimation.py:59-70` (cam2world).
    """
    return points @ campose[:3, :3].T + campose[:3, 3]


@high_precision
def cad2world_matrix(rot_euler: jax.Array, loc: jax.Array, scale: jax.Array,
                     with_scale: bool = True) -> jax.Array:
    """Compose a 4x4 CAD->world matrix from euler rotation, location, scalar scale.

    Reference `Tracking/datasets/graph_dataset.py:373-402` (cad2world_mat):
    top-left block = diag(scale) @ R.
    """
    rotm = euler_to_rotmat(rot_euler)
    block = jnp.where(with_scale, scale, 1.0) * rotm
    mat = jnp.eye(4)
    mat = mat.at[:3, :3].set(block)
    mat = mat.at[:3, 3].set(loc)
    return mat


# Canonical 8-corner ordering produced by the reference's sort_bbox
# (`PoseEst/pose_estimation.py:72-93`), expressed as (sx, sy, sz) signs:
#   0:(+,+,+) 1:(+,+,-) 2:(-,+,-) 3:(-,+,+)   (top face, y = max)
#   4:(+,-,+) 5:(+,-,-) 6:(-,-,-) 7:(-,-,+)   (bottom face, y = min)
# NumPy (not jnp) so importing this module never initialises a JAX backend
# (multi-host runs must call jax.distributed.initialize first).
_CANONICAL_SIGNS = np.array(
    [
        [1, 1, 1], [1, 1, -1], [-1, 1, -1], [-1, 1, 1],
        [1, -1, 1], [1, -1, -1], [-1, -1, -1], [-1, -1, 1],
    ],
    dtype=np.float32,
)


def aabb_corners(mins: jax.Array, maxs: jax.Array) -> jax.Array:
    """Axis-aligned box (min, max) -> 8 corners in the reference's canonical
    counter-clockwise order (see sort_bbox, `PoseEst/pose_estimation.py:72-93`)."""
    center = (mins + maxs) / 2
    half = (maxs - mins) / 2
    return center + _CANONICAL_SIGNS * half


def sort_bbox(corners: jax.Array) -> jax.Array:
    """Sort arbitrary 8 box corners (8, 3) into the reference canonical order.

    Mirrors `PoseEst/pose_estimation.py:72-93`: sort by y desc; within the two
    y-groups by x desc; then by z with the reference's per-pair flip pattern.
    """
    # y descending
    y_idx = jnp.flip(jnp.argsort(corners[:, 1]))
    c = corners[y_idx]
    # x descending within each group of 4
    x1 = jnp.flip(jnp.argsort(c[0:4, 0]))
    x2 = jnp.flip(jnp.argsort(c[4:8, 0])) + 4
    c = c[jnp.concatenate([x1, x2])]
    # z ordering: pairs (0,1) desc, (2,3) asc, (4,5) desc, (6,7) asc
    z1 = jnp.flip(jnp.argsort(c[0:2, 2]))
    z2 = jnp.argsort(c[2:4, 2]) + 2
    z3 = jnp.flip(jnp.argsort(c[4:6, 2])) + 4
    z4 = jnp.argsort(c[6:8, 2]) + 6
    return c[jnp.concatenate([z1, z2, z3, z4])]


def sort_bbox_np(corners) -> "np.ndarray":
    """NumPy mirror of `sort_bbox` for host-side data loading.

    The 3D-IoU family (`geometry/iou3d.box3d_iou`, mirroring the
    reference's `compute_3d_iou`) reads boxes by CANONICAL corner index
    (top face = corners[0:4], BEV rect = corners[[3,2,1,0]]), so corner
    ORDER is semantic.  The reference guarantees it by sorting GT boxes
    at crop time (`PoseEst/pose_estimation.py:194` run_crop_3dbbox);
    dataset-raw `3Dbbox` corners (MOTFront json / fixtures) arrive in
    arbitrary order and MUST be canonicalised before any IoU — unsorted
    GT made every pred-vs-GT 3D IoU ~0, silently killing GT-identity
    assignment (the rounds-4/5 `iou3d: 0.000` gate-funnel rows)."""
    import numpy as np
    c = np.asarray(corners, np.float32)
    c = c[np.flip(np.argsort(c[:, 1], kind="stable"))]
    x1 = np.flip(np.argsort(c[0:4, 0], kind="stable"))
    x2 = np.flip(np.argsort(c[4:8, 0], kind="stable")) + 4
    c = c[np.concatenate([x1, x2])]
    z1 = np.flip(np.argsort(c[0:2, 2], kind="stable"))
    z2 = np.argsort(c[2:4, 2], kind="stable") + 2
    z3 = np.flip(np.argsort(c[4:6, 2], kind="stable")) + 4
    z4 = np.argsort(c[6:8, 2], kind="stable") + 6
    return c[np.concatenate([z1, z2, z3, z4])]


def box_corners_to_minmax(corners: jax.Array) -> jax.Array:
    """8x3 corner box -> (6,) [xmin ymin zmin xmax ymax zmax].

    Reference `Tracking/datasets/graph_dataset.py:363-371` (box2minmax).
    """
    return jnp.concatenate([corners.min(axis=-2), corners.max(axis=-2)], axis=-1)
