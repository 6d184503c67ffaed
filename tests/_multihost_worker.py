"""Worker process for the simulated multi-host test (tests/test_multihost.py).

Each worker is one "host": 2 virtual CPU devices, initialises
jax.distributed through the MOT3D_* env-var path, builds the global mesh,
feeds only its LOCAL half of the batch, and runs the real sharded tracking
train step.  Rank 0 writes the resulting loss + a parameter checksum for the
parent test to compare against a single-process run.

Usage: python _multihost_worker.py <rank> <nproc> <port> <out_json>
"""

import json
import os
import sys

rank, nproc, port, out_json = (int(sys.argv[1]), int(sys.argv[2]),
                               sys.argv[3], sys.argv[4])

# Platform forcing must happen through jax.config before the first backend
# initialisation (this environment pre-imports a TPU platform plugin via
# sitecustomize; see tests/conftest.py).
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["MOT3D_COORDINATOR"] = f"127.0.0.1:{port}"
os.environ["MOT3D_NUM_PROCESSES"] = str(nproc)
os.environ["MOT3D_PROCESS_ID"] = str(rank)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mot3d_tpu.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()  # ranks share compilations across runs

# jax.distributed.initialize must run before ANY backend touch — package
# imports below create module-level device arrays, so initialise first.
from mot3d_tpu.parallel.multihost import (  # noqa: E402
    host_local_batch_to_global, is_main_process, make_global_mesh,
    maybe_initialize_distributed, replicate_global)

assert maybe_initialize_distributed(), "env-var path must initialise"

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from mot3d_tpu.config import Config, TrackingConfig  # noqa: E402
from mot3d_tpu.data.synthetic import synthetic_sequence  # noqa: E402
from mot3d_tpu.models.mpn import TrackerModel  # noqa: E402
from mot3d_tpu.parallel.train_step import (  # noqa: E402
    TrackingTrainState, make_tracking_train_step)
from mot3d_tpu.tracking.graph_builder import make_template  # noqa: E402
from mot3d_tpu.train.tracking_trainer import sequences_to_batch  # noqa: E402
assert jax.process_count() == nproc, jax.process_count()
assert (jax.process_index() == 0) == is_main_process()

trk = TrackingConfig(seq_len=3, max_instances_per_frame=4, max_frame_dist=2)
cfg = Config().replace(tracking=trk)
model = TrackerModel(cfg.graph)
template = make_template(trk.seq_len, trk.max_instances_per_frame,
                         trk.max_frame_dist)

mesh = make_global_mesh()
assert mesh.devices.size == 2 * nproc

# Per-host feeding: this process loads ONLY its local half (seeds 2r, 2r+1)
# of the global batch (seeds 0..2*nproc-1).
local_seqs = [synthetic_sequence(trk, seed=2 * rank + i, num_objects=3,
                                 noise=0.01)._asdict() for i in range(2)]
gbatch = host_local_batch_to_global(mesh, sequences_to_batch(local_seqs))

n_nodes = trk.seq_len * trk.max_instances_per_frame
e2 = len(template.src_frame) * 2
params = jax.jit(lambda k: model.init(
    k, jnp.zeros((n_nodes, 32, 32, 32)), jnp.zeros(e2, jnp.int32),
    jnp.zeros(e2, jnp.int32), jnp.zeros((e2, cfg.graph.edge_in_dim)),
    jnp.zeros(e2, bool)))(jax.random.PRNGKey(0))
opt = optax.adamw(cfg.tracking.learning_rate,
                  weight_decay=cfg.tracking.weight_decay)
state = replicate_global(mesh, TrackingTrainState(
    params, opt.init(params), jnp.zeros((), jnp.int32)))

step = jax.jit(make_tracking_train_step(model, template, cfg, opt))
new_state, metrics = step(state, gbatch)
loss = float(metrics["tracking_loss"])
# Parameter checksum: params are replicated, so any addressable shard
# holds the full value.
leaves = jax.tree_util.tree_leaves(new_state.params)
checksum = float(sum(np.abs(np.asarray(l.addressable_data(0))).sum()
                     for l in leaves))

if is_main_process():
    with open(out_json, "w") as f:
        json.dump({"loss": loss, "checksum": checksum,
                   "process_count": jax.process_count(),
                   "global_devices": int(mesh.devices.size)}, f)
print(f"rank {rank}: loss={loss:.6f} checksum={checksum:.4f}", flush=True)
