"""Drive mot3d_tpu's public geometry API end-to-end on the real TPU:
synthetic object -> depth render-ish -> backproject -> outlier removal ->
RANSAC Umeyama -> world box -> 3D IoU vs GT. This is the reference's
run_pose flow (PoseEst/pose_estimation.py:245-412) expressed via the package."""
import numpy as np

from mot3d_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax, jax.numpy as jnp
print("devices:", jax.devices())

from mot3d_tpu.config import default_config
from mot3d_tpu.geometry import (
    make_intrinsics, backproject_depth, statistical_outlier_mask,
    estimate_similarity_transform, cam_to_world, aabb_corners, box3d_iou,
    rotation_error_deg, euler_to_rotmat,
)
from mot3d_tpu.geometry.backproject import gather_masked_points, gather_masked_values
from mot3d_tpu.geometry.umeyama import apply_similarity

cfg = default_config()
cam = cfg.camera
K = make_intrinsics(cam.fx, cam.fy, cam.cx, cam.cy)
rng = np.random.default_rng(0)

# Synthetic scene: an object occupying a patch of the depth map, with a known
# similarity transform from NOCS space (unit cube [0,1]^3 - 0.5) to camera.
H, W = cam.height, cam.width
true_euler = np.array([0.0, 0.6, 0.0], np.float32)
R_true = np.asarray(euler_to_rotmat(jnp.array(true_euler)))
s_true, t_true = 1.4, np.array([0.3, -0.2, -2.5], np.float32)

# Sample NOCS points on a plane-ish patch; project to pixels to build depth+nocs maps.
nocs_pts = rng.uniform(0.05, 0.95, size=(3000, 3)).astype(np.float32) - 0.5
cam_pts = s_true * nocs_pts @ R_true.T + t_true  # camera space (y,-z flipped convention applies below)
# convert our camera-space convention (x, -y, -z negated) back to pixels:
x, y, z = cam_pts[:,0], -cam_pts[:,1], -cam_pts[:,2]
u = np.round(x / z * cam.fx + cam.cx).astype(int)
v = np.round(y / z * cam.fy + cam.cy).astype(int)
ok = (u>=0)&(u<W)&(v>=0)&(v<H)&(z>0)
depth = np.zeros((H,W), np.float32); nocs_map = np.zeros((H,W,3), np.float32)
depth[v[ok], u[ok]] = z[ok]
nocs_map[v[ok], u[ok]] = nocs_pts[ok] + 0.5
mask = depth > 0
print("object pixels:", mask.sum())

# --- the pipeline, jitted as one program ---
@jax.jit
def fit_pose(depth, nocs_map, mask, key):
    pts_map, valid = backproject_depth(depth, K, mask)
    feats = jnp.concatenate([pts_map, nocs_map - 0.5], axis=-1)
    buf, bval, _ = gather_masked_values(feats, valid, cfg.pose.max_points)
    dpts, npts = buf[:, :3], buf[:, 3:]
    keep = statistical_outlier_mask(dpts, bval, cfg.pose.outlier_nb_neighbors,
                                    cfg.pose.outlier_std_ratio, cfg.pose.outlier_min_points)
    fit = estimate_similarity_transform(npts, dpts, keep, key,
                                        cfg.pose.ransac_iters, cfg.pose.ransac_sample_size)
    return fit

fit = fit_pose(jnp.array(depth), jnp.array(nocs_map), jnp.array(mask), jax.random.PRNGKey(0))
print("valid:", bool(fit.valid), "scale:", float(fit.scale), "(true", s_true, ")")
print("trans:", np.asarray(fit.translation), "(true", t_true, ")")
rot_err = float(rotation_error_deg(jnp.asarray(fit.rotation).T, jnp.array(R_true)))
print("rotation error (deg):", rot_err)

# World box + IoU vs GT
campose = np.eye(4, dtype=np.float32); campose[:3,3] = [1., 0.5, 0.]
pts_map, valid = backproject_depth(jnp.array(depth), K, jnp.array(mask))
dbuf, dval = gather_masked_points(pts_map, valid, cfg.pose.max_points)
world = cam_to_world(dbuf, jnp.array(campose))
wmin = jnp.where(dval[:,None], world,  jnp.inf).min(0)
wmax = jnp.where(dval[:,None], world, -jnp.inf).max(0)
pred_box = aabb_corners(wmin, wmax)
gt_world = cam_pts @ campose[:3,:3].T + campose[:3,3]
gt_box = aabb_corners(jnp.array(gt_world.min(0)), jnp.array(gt_world.max(0)))
iou, iou2d = box3d_iou(pred_box, gt_box)
print("world-box 3D IoU vs GT:", float(iou), " BEV IoU:", float(iou2d))

# probes ------------------------------------------------------------------
# 1: all-invalid mask (object fully occluded)
fit0 = fit_pose(jnp.array(depth), jnp.array(nocs_map), jnp.zeros_like(jnp.array(mask)), jax.random.PRNGKey(1))
print("PROBE empty-mask -> valid:", bool(fit0.valid), "finite:", bool(jnp.isfinite(fit0.scale)))
# 2: tiny object (8 pixels < sample_size 10)
m2 = np.zeros_like(mask); m2[v[ok][:8], u[ok][:8]] = True
fit2 = fit_pose(jnp.array(depth), jnp.array(nocs_map), jnp.array(m2), jax.random.PRNGKey(2))
print("PROBE 8-pixel object -> valid:", bool(fit2.valid), "finite:", bool(jnp.isfinite(fit2.scale)))
# 3: gradient through the whole fit (differentiable-pose north star)
def loss(shift):
    f = fit_pose(jnp.array(depth), jnp.array(nocs_map)+shift, jnp.array(mask), jax.random.PRNGKey(0))
    return f.scale
g = jax.grad(loss)(jnp.zeros(3))
print("PROBE grad through jitted pipeline:", np.asarray(g), "finite:", bool(jnp.isfinite(g).all()))
