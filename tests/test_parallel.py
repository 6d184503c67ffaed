"""Sharded-path tests: the pjit data-parallel train steps on an 8-CPU mesh.

Covers SURVEY.md §2.7 (the reference's detectron2 `launch()` multi-GPU DP,
`Detection/train_net.py:194-201`) as sharding over a `data` mesh: the sharded
step must produce bit-comparable results to the same step run unsharded on
one device, since parameters are replicated and the batch mean is the same
arithmetic either way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mot3d_tpu.config import Config, TrackingConfig
from mot3d_tpu.data.synthetic import synthetic_sequence
from mot3d_tpu.models.mpn import TrackerModel
from mot3d_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from mot3d_tpu.parallel.train_step import (TrackingTrainState,
                                           make_tracking_train_step)
from mot3d_tpu.tracking.graph_builder import make_template
from mot3d_tpu.train.tracking_trainer import sequences_to_batch


def _tracking_setup(n_seqs: int):
    trk = TrackingConfig(seq_len=3, max_instances_per_frame=4,
                         max_frame_dist=2)
    cfg = Config().replace(tracking=trk)
    model = TrackerModel(cfg.graph)
    template = make_template(trk.seq_len, trk.max_instances_per_frame,
                             trk.max_frame_dist)
    seqs = [synthetic_sequence(trk, seed=i, num_objects=3,
                               noise=0.01)._asdict() for i in range(n_seqs)]
    batch = sequences_to_batch(seqs)

    n_nodes = trk.seq_len * trk.max_instances_per_frame
    e2 = len(template.src_frame) * 2
    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((n_nodes, 32, 32, 32)), jnp.zeros(e2, jnp.int32),
        jnp.zeros(e2, jnp.int32), jnp.zeros((e2, cfg.graph.edge_in_dim)),
        jnp.zeros(e2, bool)))(jax.random.PRNGKey(0))
    opt = optax.adamw(cfg.tracking.learning_rate,
                      weight_decay=cfg.tracking.weight_decay)
    state = TrackingTrainState(params, opt.init(params),
                               jnp.zeros((), jnp.int32))
    step = make_tracking_train_step(model, template, cfg, opt)
    return state, batch, step


def test_mesh_has_8_devices():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_sharded_tracking_step_matches_unsharded():
    n = jax.device_count()
    assert n >= 8, "conftest must provide 8 virtual CPU devices"
    state, batch, step = _tracking_setup(8)

    # Unsharded: single device, plain jit.
    ref_state, ref_metrics = jax.jit(step)(state, batch)
    ref_loss = float(ref_metrics["tracking_loss"])
    assert np.isfinite(ref_loss) and ref_loss > 0

    # Sharded over the 8-device data mesh.
    mesh = make_mesh(8)
    sh_state = replicate(mesh, state)
    sh_batch = shard_batch(mesh, batch)
    new_state, metrics = jax.jit(step)(sh_state, sh_batch)
    sh_loss = float(metrics["tracking_loss"])

    np.testing.assert_allclose(sh_loss, ref_loss, rtol=1e-5)
    # Updated parameters must agree leaf-by-leaf (replicated psum-mean
    # gradient == unsharded batch-mean gradient).
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
    sh_leaves = jax.tree_util.tree_leaves(new_state.params)
    for a, b in zip(ref_leaves, sh_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    assert int(new_state.step) == 1


def test_sharded_tracking_step_improves_loss():
    state, batch, step = _tracking_setup(8)
    mesh = make_mesh(8)
    state = replicate(mesh, state)
    batch = shard_batch(mesh, batch)
    jit_step = jax.jit(step)
    losses = []
    for _ in range(8):
        state, metrics = jit_step(state, batch)
        losses.append(float(metrics["tracking_loss"]))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_dryrun_multichip_gate():
    """The driver gate itself: full combined step on the 8-CPU mesh."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
