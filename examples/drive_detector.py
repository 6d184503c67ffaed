"""Drive the detection model end-to-end on the default (TPU) platform at full
MOTFront resolution: synthetic scene -> train_losses (jit) -> grads -> one
Adam step -> predict (jit) -> padded detections.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python examples/drive_detector.py
"""

import time
from mot3d_tpu.runtime import enable_compilation_cache
import numpy as np
import jax
import jax.numpy as jnp
import optax

enable_compilation_cache()
print("devices:", jax.devices())

from mot3d_tpu.config import DetectionConfig
from mot3d_tpu.data.synthetic_detection import synthetic_detection_scene
from mot3d_tpu.models.mask_rcnn import GroundTruth, MaskRCNN

cfg = DetectionConfig()   # full-size: 256x320 pad, bs proposals 1000/512
scene = synthetic_detection_scene(cfg, batch=2, num_objects=4, seed=0)
gt = GroundTruth(
    boxes=jnp.array(scene.boxes), classes=jnp.array(scene.classes),
    valid=jnp.array(scene.valid), masks=jnp.array(scene.masks),
    voxels=jnp.array(scene.voxels), nocs=jnp.array(scene.nocs))
images = jnp.array(scene.images)

model = MaskRCNN(cfg)
t0 = time.time()
# Jit the init: an eager init dispatches thousands of tiny ops one by one.
init_fn = jax.jit(lambda k1, k2: model.init(
    {"params": k1}, images, gt, k2, method=MaskRCNN.train_losses))
params = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1))
n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
print(f"init: {time.time() - t0:.1f}s, {n_params / 1e6:.1f}M params")

opt = optax.adamw(8e-4, weight_decay=5e-4)
opt_state = opt.init(params)

@jax.jit
def train_step(params, opt_state, images, gt, rng):
    def loss_fn(p):
        losses = model.apply(p, images, gt, rng, method=MaskRCNN.train_losses)
        total = sum(v for k, v in losses.items() if k.startswith("loss"))
        return total, losses
    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, total, losses

t0 = time.time()
params, opt_state, total, losses = train_step(params, opt_state, images, gt,
                                              jax.random.PRNGKey(2))
jax.block_until_ready(total)
print(f"train_step compile+run: {time.time() - t0:.1f}s")
for k, v in sorted(losses.items()):
    print(f"  {k}: {float(v):.4f}")
assert np.isfinite(float(total)), "non-finite loss"

for _ in range(3):
    t0 = time.time()
    params, opt_state, total, losses = train_step(
        params, opt_state, images, gt, jax.random.PRNGKey(3))
    jax.block_until_ready(total)
print(f"train_step steady-state: {time.time() - t0 :.3f}s  "
      f"({2 / (time.time() - t0):.1f} img/s)")

predict = jax.jit(lambda p, im: model.apply(p, im, method=MaskRCNN.predict))
t0 = time.time()
dets = predict(params, images)
jax.block_until_ready(dets.boxes)
print(f"predict compile+run: {time.time() - t0:.1f}s")
t0 = time.time()
dets = predict(params, images)
jax.block_until_ready(dets.boxes)
dt = time.time() - t0
print(f"predict steady-state: {dt:.3f}s ({2 / dt:.1f} img/s)")
print("detections valid:", np.asarray(dets.valid.sum(1)),
      "scores[0]:", np.asarray(dets.scores[0][:4]).round(3))
assert np.isfinite(np.asarray(dets.boxes)).all()

# probe: empty ground truth must still give finite losses
empty_gt = GroundTruth(
    boxes=jnp.zeros_like(gt.boxes), classes=jnp.zeros_like(gt.classes),
    valid=jnp.zeros_like(gt.valid), masks=jnp.zeros_like(gt.masks),
    voxels=jnp.zeros_like(gt.voxels), nocs=jnp.zeros_like(gt.nocs))
_, _, total_e, losses_e = train_step(params, opt_state, images, empty_gt,
                                     jax.random.PRNGKey(4))
print("PROBE empty-GT total loss finite:", bool(np.isfinite(float(total_e))))
