"""MetricsWriter: block-buffered JSONL logging (round-5 steady-state fix).

The writer must not fetch device scalars per step (each jax.device_get
blocks on step completion + a tunnel round trip); records are staged and
materialised in log_every-sized blocks — but nothing may be lost, and
flush/close must drain the buffer.
"""

import json

import jax.numpy as jnp

from mot3d_tpu.train.metrics_writer import MetricsWriter


def _read(path):
    with open(path) as f:
        return [json.loads(line) for line in f]


class TestMetricsWriter:
    def test_buffers_then_flushes_blocks(self, tmp_path):
        w = MetricsWriter(str(tmp_path), log_every=5)
        for step in range(1, 5):
            w.write(step, {"loss": jnp.asarray(step * 0.5)})
        # Nothing on disk yet: 4 < log_every and no echo step reached.
        assert _read(w.path) == []
        w.write(5, {"loss": jnp.asarray(2.5)})  # echo step -> flush
        recs = _read(w.path)
        assert [r["step"] for r in recs] == [1, 2, 3, 4, 5]
        assert recs[2]["loss"] == 1.5

    def test_close_drains_buffer(self, tmp_path):
        w = MetricsWriter(str(tmp_path), log_every=100)
        w.write(1, {"a": jnp.asarray(1.0)})
        w.write(2, {"a": 2.0})  # plain floats allowed too
        w.close()
        recs = _read(w.path)
        assert [r["step"] for r in recs] == [1, 2]
        assert recs[1]["a"] == 2.0

    def test_echo_forces_flush(self, tmp_path, capsys):
        w = MetricsWriter(str(tmp_path), log_every=100)
        w.write(7, {"mota": 0.5}, split="test", echo=True)
        recs = _read(w.path)
        assert recs[0]["split"] == "test" and recs[0]["mota"] == 0.5
        assert "[test 7]" in capsys.readouterr().out
