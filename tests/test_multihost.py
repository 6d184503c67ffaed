"""Multi-host scaffolding tests (SURVEY §5.8, VERDICT r1 item 8).

The reference scales out via detectron2 `launch(num_machines, machine_rank,
dist_url)` (`Detection/train_net.py:194-201`).  The rebuild's equivalent —
`jax.distributed.initialize` via env vars + a global mesh + per-host batch
feeding — is exercised here two ways:

  1. in-process, single-process degenerate forms (mesh/feeding/replication
     must behave exactly like the single-host helpers);
  2. a REAL 2-process simulation: two subprocesses, 2 CPU devices each,
     rendezvous over a localhost coordinator, each feeding only its local
     half of the batch through the real sharded tracking train step; the
     result must match a single-process run of the same global batch.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mot3d_tpu.config import Config, TrackingConfig
from mot3d_tpu.data.synthetic import synthetic_sequence
from mot3d_tpu.models.mpn import TrackerModel
from mot3d_tpu.parallel.multihost import (global_batch_size,
                                          host_local_batch_to_global,
                                          is_main_process, make_global_mesh,
                                          maybe_initialize_distributed,
                                          replicate_global)
from mot3d_tpu.parallel.train_step import (TrackingTrainState,
                                           make_tracking_train_step)
from mot3d_tpu.tracking.graph_builder import make_template
from mot3d_tpu.train.tracking_trainer import sequences_to_batch


class TestSingleProcessForms:
    def test_no_env_no_init(self, monkeypatch):
        monkeypatch.delenv("MOT3D_COORDINATOR", raising=False)
        monkeypatch.delenv("MOT3D_NUM_PROCESSES", raising=False)
        assert maybe_initialize_distributed() is False
        assert is_main_process()
        assert global_batch_size(4) == 4

    def test_global_mesh_and_feeding(self):
        mesh = make_global_mesh()
        assert mesh.devices.size == jax.device_count()
        assert mesh.axis_names == ("data",)
        x = np.arange(mesh.devices.size * 3, dtype=np.float32).reshape(
            mesh.devices.size, 3)
        g = host_local_batch_to_global(mesh, {"x": x})["x"]
        # process_count == 1: the global array IS the local batch.
        np.testing.assert_array_equal(np.asarray(g), x)
        assert g.sharding.spec == jax.sharding.PartitionSpec("data")

    def test_replicate_global(self):
        mesh = make_global_mesh()
        tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
        rep = replicate_global(mesh, tree)["w"]
        np.testing.assert_array_equal(np.asarray(rep), tree["w"])
        assert rep.sharding.is_fully_replicated


def _single_process_reference(nproc: int):
    """The same global batch (seeds 0..2*nproc-1) through the same step on
    one process."""
    trk = TrackingConfig(seq_len=3, max_instances_per_frame=4,
                         max_frame_dist=2)
    cfg = Config().replace(tracking=trk)
    model = TrackerModel(cfg.graph)
    template = make_template(trk.seq_len, trk.max_instances_per_frame,
                             trk.max_frame_dist)
    seqs = [synthetic_sequence(trk, seed=i, num_objects=3,
                               noise=0.01)._asdict()
            for i in range(2 * nproc)]
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
    new_state, metrics = jax.jit(step)(state, batch)
    checksum = float(sum(np.abs(np.asarray(l)).sum()
                         for l in jax.tree_util.tree_leaves(
                             new_state.params)))
    return float(metrics["tracking_loss"]), checksum


@pytest.mark.slow
def test_two_process_cpu_simulation(tmp_path):
    """Two real processes, coordinator rendezvous, per-host feeding, sharded
    step — must reproduce the single-process result."""
    nproc = 2
    # Pick a free port for the coordinator.
    with socket.socket() as s:
        try:
            s.bind(("127.0.0.1", 0))
        except OSError:
            pytest.skip("cannot bind localhost sockets in this sandbox")
        port = s.getsockname()[1]

    out_json = tmp_path / "rank0.json"
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(worker))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, worker, str(r), str(nproc), str(port),
         str(out_json)], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for r in range(nproc)]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outputs.append(out.decode())
    if any(p.returncode != 0 for p in procs):
        joined = "\n---\n".join(outputs)
        if "Connection refused" in joined or "DEADLINE_EXCEEDED" in joined:
            pytest.skip("distributed rendezvous unavailable in this "
                        "environment:\n" + joined[-500:])
        raise AssertionError("multihost workers failed:\n" + joined[-2000:])

    got = json.loads(out_json.read_text())
    assert got["process_count"] == nproc
    assert got["global_devices"] == 2 * nproc

    ref_loss, ref_checksum = _single_process_reference(nproc)
    np.testing.assert_allclose(got["loss"], ref_loss, rtol=1e-5)
    np.testing.assert_allclose(got["checksum"], ref_checksum, rtol=1e-5)
